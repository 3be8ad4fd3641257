package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round k-core peeling over an undirected simple graph — the
  * other structural census moment a graph builder publishes (dense-core
  * extraction / junk-periphery trim). True k-core iterates to a fixed
  * point; a FIXED round count is the deterministic, oracle-replayable
  * contract (the integer-PageRank discipline): both engines run exactly
  * `rounds` peels and must agree on the survivor set and degrees.
  *
  * Scale shape: each round is two left_semi equi-joins on single node
  * keys (edge side never grows — it only shrinks) plus one
  * map-side-combined degree count; rounds materialize via
  * localCheckpoint so lineage stays flat (the CC discipline). Peeling
  * is monotone, so a round is never undone — at 100× data the round
  * count stays the knob, not the graph size.
  */
object KCore {

  /** Nodes still active after `rounds` peels at threshold `k`, with the
    * degree they held in the final round's induced subgraph. Input must
    * be an undirected SIMPLE edge list (one row per edge, no loops);
    * vertices = edge endpoints. */
  def peel(edges: DataFrame, aCol: String, bCol: String, k: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, "at least one peel round")
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(true) // probed twice per round — never re-derive upstream
    var active = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v"))).distinct()
    var deg: DataFrame = null
    for (_ <- 1 to rounds) {
      val er = e
        .join(active.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(active.select(col("v").as("b")), Seq("b"), "left_semi")
      deg = er.select(col("a").as("v")).unionAll(er.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      active = deg.filter(col("deg") >= k).select("v")
    }
    deg.filter(col("deg") >= k)
      .select(col("v").as("node_id"), col("deg").as("core_deg"))
  }
}
