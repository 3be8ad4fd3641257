package graft.cc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphFrames-free connected components over an edge DataFrame
  * (north-rule stage 4: canonical-ID resolution for alias clusters).
  *
  * Algorithm: hash-to-min label propagation with pointer-jumping
  * (label-path doubling), the standard MapReduce CC formulation
  * (Rastogi et al., "Finding Connected Components in Map-Reduce in
  * Logarithmic Rounds"). Each round:
  *   1. every vertex takes the min label among itself and its neighbors
  *      — a `groupBy(v).agg(min)` which is partially aggregable, so
  *      map-side combine absorbs hub-vertex skew before the shuffle
  *      (the "salting for hub entities" concern: no reduce-side hot key
  *      ever sees more than one pre-aggregated record per map partition);
  *   2. two pointer-jump steps `label := label(label)` collapse label
  *      chains, giving O(log n) total rounds even on path graphs;
  *   3. `localCheckpoint` truncates the lineage so plan size stays O(1)
  *      per iteration instead of growing with the loop.
  *
  * At cluster scale the edge table is the big side: it is materialized
  * once, and every per-round join shuffles only the (much smaller)
  * label table against it; AQE (enabled in the session) re-plans skewed
  * join partitions at runtime.
  *
  * The reference has no CC operator (it trusts the CURIE as canonical —
  * SURVEY.md §2.3 note); this is the north rule's required addition.
  */
object ConnectedComponents {

  /** edges: two string columns `src`, `dst` (undirected semantics).
    * `vertices`: optional single-column `v` DataFrame of the full vertex
    * universe — isolated vertices (no incident edge) become singleton
    * components; without it only edge-touched vertices are returned.
    * Returns (member, component) with component = min vertex id
    * (lexicographic) of the member's connected component. */
  def run(spark: SparkSession, edges: DataFrame,
          vertices: Option[DataFrame] = None, maxIter: Int = 50): DataFrame = {
    // Undirected closure, deduped and materialized once.
    val e = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v")))
      .union(vertices.map(_.select(col("v"))).getOrElse(
        e.select(col("src").as("v")).limit(0)))
      .distinct()
      .withColumn("label", col("v"))
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // (1) min over self ∪ neighbor labels — partial agg handles hubs.
      val nbr = e.join(labels, e("dst") === labels("v"))
        .select(e("src").as("v"), col("label").as("cand"))
      var next = labels.select(col("v"), col("label").as("cand"))
        .union(nbr)
        .groupBy("v").agg(min("cand").as("label"))

      // (2) pointer jumping ×2: label := label(label).
      var j = 0
      while (j < 2) {
        val l2 = next.select(col("v").as("lv"), col("label").as("llabel"))
        next = next.join(l2, next("label") === l2("lv"), "left")
          .select(next("v"), coalesce(col("llabel"), next("label")).as("label"))
        j += 1
      }
      val nextCp = next.localCheckpoint(true)

      // (3) convergence probe: any vertex whose label still changed?
      val changed = nextCp.alias("n")
        .join(labels.alias("o"), col("n.v") === col("o.v"))
        .filter(col("n.label") =!= col("o.label"))
      converged = changed.isEmpty
      labels = nextCp
      iter += 1
    }
    labels.select(col("v").as("member"), col("label").as("component"))
  }
}
