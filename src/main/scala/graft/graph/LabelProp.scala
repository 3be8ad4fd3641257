package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-round majority label propagation (Raghavan et al. 2007) —
  * community detection as iterative neighborhood aggregation. Unlike
  * min-label propagation (which converges to connected components,
  * already covered by the CC operator), each round every node adopts
  * the MOST FREQUENT label among its neighbors, ties to the smallest
  * label — deterministic under any partitioning, and a fixed round
  * count is the oracle-replayable contract (the k-core/PageRank
  * discipline).
  *
  * Scale shape per round: one equi-join of the symmetrized edge list
  * against the label table (8-byte keys), one map-side-combined
  * (node, label) count, one per-node window bounded by the node's
  * distinct neighbor labels; rounds materialize via localCheckpoint.
  */
object LabelProp {

  /** (node_id, label) after `rounds` majority updates. `initLabel` maps
    * the node column to its seed label (e.g. `v % 16`). Isolated nodes
    * cannot occur (vertices = edge endpoints). */
  def propagate(edges: DataFrame, aCol: String, bCol: String,
      initLabel: Column => Column, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true) // reused every round
    var labels = sym.select(col("a").as("v")).distinct()
      .select(col("v"), initLabel(col("v")).as("label"))
    val w = Window.partitionBy("v")
      .orderBy(col("n").desc, col("label").asc)
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels.select(col("v").as("nb"), col("label")),
          col("b") === col("nb"))
        .groupBy(col("a").as("v"), col("label"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("v"), col("label"))
        .localCheckpoint(true)
    }
    labels.select(col("v").as("node_id"), col("label"))
  }
}
