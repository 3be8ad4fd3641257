package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation (the DeepWalk/node2vec
  * precursor: walks ARE the training sentences for graph skip-gram).
  * "Random" is a hash, not an RNG: at step s from node v the next hop
  * is `sortedNeighbors[((v·48271 + s·8191) mod 2147483647) mod deg]`
  * (the MINSTD mixing constants already used by the samplers) — every
  * engine replays the same walks bit-for-bit, and a re-run on different
  * partitioning emits the identical corpus.
  *
  * Scale shape: the adjacency layout is one groupBy building a sorted
  * out-neighbor list per node — indexed access is what a walk engine
  * needs, and the list is bounded by the out-degree (cap hub nodes
  * upstream if the graph has celebrity out-degrees; the KG edge
  * families here are bounded by construction). Each step is ONE
  * equi-join of the frontier against the adjacency on the current
  * node — walk state is (start, cur), never a path array.
  */
object RandomWalks {

  private val M = 2147483647L

  /** One walk per start node, `len` steps, over the DIRECTED edge list;
    * walks stop early at sinks. Returns (start_id, step, at_node) with
    * step 1..len. */
  def walks(edges: DataFrame, srcCol: String, dstCol: String, len: Int): DataFrame = {
    require(len >= 1)
    val adj = edges
      .select(col(srcCol).as("cur"), col(dstCol).as("dst"))
      .groupBy("cur")
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .localCheckpoint(true) // reused every step
    var frontier = adj.select(col("cur").as("start_id"), col("cur"))
    var out: DataFrame = null
    for (s <- 1 to len) {
      val idx = pmod(pmod(col("cur") * 48271L + lit(s.toLong) * 8191L, lit(M)),
        size(col("nbrs")))
      val step = frontier.join(adj, "cur")
        .select(col("start_id"),
          lit(s.toLong).as("step"),
          element_at(col("nbrs"), (idx + 1).cast("int")).as("at_node"))
        .localCheckpoint(true)
      out = if (out == null) step else out.unionByName(step)
      frontier = step.select(col("start_id"), col("at_node").as("cur"))
    }
    out
  }
}
