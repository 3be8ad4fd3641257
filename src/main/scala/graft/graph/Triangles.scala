package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected simple graph —
  * the KG census metric behind clustering-coefficient / community
  * quality reporting (the reference reports only degree-level census;
  * triangle participation is the next structural moment a graph
  * builder publishes).
  *
  * Algorithm: degree-ordered edge orientation (Cohen 2009's MapReduce
  * triangle recipe; also the `NodeIterator++` bound): orient every
  * edge from its (degree, id)-smaller endpoint to the larger, so
  *  - each triangle has exactly ONE vertex whose two triangle edges
  *    both point away (its minimum-rank corner) — every triangle is
  *    built exactly once, no post-hoc dedup;
  *  - wedge fan-out per vertex is bounded by its OUT-degree, which the
  *    orientation caps at O(sqrt(m)) — the skew killer: a celebrity
  *    node of degree 10^7 contributes wedges only through its few
  *    higher-rank neighbours, never deg² pairs.
  * All joins are equi-joins on single node keys (8-byte-hashable at
  * scale); nothing is collected, no window spans a full partition.
  */
object Triangles {

  /** Per-node triangle participation counts: (node_id, n_triangles),
    * nodes in no triangle absent. Input must be an undirected SIMPLE
    * edge list with `aCol` < `bCol` (one row per edge, no loops). */
  def perNode(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // e feeds the degree count (twice), the orientation and the closure
    // probe; deg feeds both endpoints' rank joins — materialize both so
    // an expensive upstream edge derivation never re-executes
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(true)
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    // rank = (degree, id); orient src -> dst with rank(src) < rank(dst)
    val da = deg.select(col("v").as("a"), col("d").as("da"))
    val db = deg.select(col("v").as("b"), col("d").as("db"))
    val oriented = e.join(da, "a").join(db, "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("dst"))
    // wedges at the min-rank corner; dst pair canonicalized by id so
    // the closure probe is a plain equi-join against the (a < b) input
    val o1 = oriented.select(col("src").as("u"), col("dst").as("v1"))
    val o2 = oriented.select(col("src").as("u"), col("dst").as("v2"))
    val wedges = o1.join(o2, "u").filter(col("v1") < col("v2"))
    val tri = wedges.join(e,
      wedges("v1") === e("a") && wedges("v2") === e("b"), "left_semi")
    tri.select(explode(array(col("u"), col("v1"), col("v2"))).as("node_id"))
      .groupBy("node_id").agg(count(lit(1)).as("n_triangles"))
  }
}
