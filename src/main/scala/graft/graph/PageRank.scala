package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity salience over the constructed KG: PageRank in EXACT
  * fixed-point integer arithmetic.
  *
  * A KG-construction pipeline ranks its entities (which canonical nodes
  * matter? which documents are hubs?) before export — the reference
  * leans on downstream Neo4j for this; here it is a first-class
  * operator over the edge frame.
  *
  * Floating-point PageRank is NOT reproducible on a cluster: the
  * per-node contribution sum is a float reduction whose partition order
  * changes run to run. This implementation keeps every score a LONG in
  * micro-units (node mass starts at `scale` = 10^6) and every transfer
  * an integer division, so the result is bit-identical at any
  * parallelism AND value-level checkable in any SQL engine:
  *
  *   s_0(v)   = scale
  *   s_t+1(v) = floor(scale·(100−damp)/100)
  *              + Σ_{u→v} (s_t(u) · damp) div (100 · outdeg(u))
  *
  * (damp = 85 ≈ the public 0.85; truncation loses ≤1 micro-unit per
  * in-edge per round — the price of determinism, identical in both
  * engines by construction.) Dangling-node mass is retired rather than
  * redistributed, the standard simplification; ranking is unaffected on
  * connected graphs and documented here for the rest.
  *
  * Scale shape: per round ONE equi-join of edges with the score frame
  * on `src` (8-byte keys) and ONE groupBy on `dst` with a map-side
  * partial integer sum; out-degrees are joined once up front and reused
  * every round. Rounds materialize through localCheckpoint (the CC
  * discipline) so plan depth and size statistics stay O(1) per round.
  * LONG micro-units overflow only past 2^63 total mass ≈ 9·10^12 nodes
  * — above the 10^12 design point, and `scale` is tunable down.
  */
object PageRank {

  /** Fixed-iteration integer PageRank over `edges` (src, dst) —
    * parallel edges count toward out-degree, matching the SQL mirror.
    * Returns (node_id, salience) for every node appearing as a src or
    * dst. */
  def salience(edges: DataFrame, iters: Int, scale: Long = 1000000L,
               damp: Long = 85L): DataFrame = {
    require(iters >= 0 && damp >= 0 && damp <= 100 && scale > 0,
      s"bad PageRank params: iters=$iters damp=$damp scale=$scale")
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    // out-degrees computed ONCE; every round reuses this frame
    val eDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint(true)
    val base = scale * (100L - damp) / 100L
    var s = nodes.withColumn("score", lit(scale))
    for (_ <- 0 until iters) {
      val contrib = eDeg
        .join(s.select(col("id").as("src"), col("score")), "src")
        .select(col("dst").as("id"),
          expr(s"(score * $damp) div (100 * deg)").as("c"))
        .groupBy("id").agg(sum(col("c")).as("m"))
      s = nodes
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("m"), lit(0L))).as("score"))
        .localCheckpoint(true)
    }
    s.select(col("id").as("node_id"), col("score").as("salience"))
  }
}
