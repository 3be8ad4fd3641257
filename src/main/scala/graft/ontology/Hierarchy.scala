package graft.ontology

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ontology/hierarchy expansion (SURVEY.md §2.9, O1-O8): the reference
  * walks in-memory parent maps (go_adapter.py:1029 ancestors,
  * disease_adapter.py:326-331 parents); distributed equivalent is an
  * iterative self-join transitive closure with lineage truncation.
  *
  * DAG depth is small (ontologies: ≤ ~20 levels), so the loop count is
  * bounded by depth, not data size; each round is one shuffle on the
  * frontier — the frontier shrinks as paths terminate at roots.
  */
object Hierarchy {

  /** edges: (child, parent). Returns all (node, ancestor) pairs,
    * transitive, excluding self. */
  def ancestors(edges: DataFrame, maxDepth: Int = 30): DataFrame = {
    val base = edges.select(col("child").as("node"), col("parent").as("ancestor"))
      .distinct().localCheckpoint(true)
    var acc = base
    var frontier = base
    var depth = 1
    var done = false
    while (!done && depth < maxDepth) {
      val next = frontier.alias("f")
        .join(base.alias("e"), col("f.ancestor") === col("e.node"))
        .select(col("f.node").as("node"), col("e.ancestor").as("ancestor"))
        .distinct()
        .join(acc, Seq("node", "ancestor"), "left_anti")
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        acc = acc.unionByName(next).localCheckpoint(true)
        frontier = next
        depth += 1
      }
    }
    // Fail loudly on non-convergence (cycle or depth > maxDepth) instead
    // of silently returning a partial closure — mirrors CC.run's guard.
    require(done,
      s"hierarchy closure did not converge within maxDepth=$maxDepth " +
        "(cycle in the ontology DAG, or raise maxDepth)")
    acc
  }
}
