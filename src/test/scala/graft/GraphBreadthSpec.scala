package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.Triangles
import graft.textops.{Dsir, UrlOps}

/** Triangle census, web-link extraction, DSIR selection. */
class GraphBreadthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------- Triangles

  /** Undirected simple edges, a < b. */
  private def edges(ps: (String, String)*) = ps.toDF("a", "b")

  test("triangles: K4 gives every node 3 triangles; disjoint triangle gives 1") {
    val e = edges(
      ("1", "2"), ("1", "3"), ("1", "4"), ("2", "3"), ("2", "4"), ("3", "4"),
      ("x", "y"), ("x", "z"), ("y", "z"))
    val r = Triangles.perNode(e, "a", "b").as[(String, Long)].collect().toMap
    assert(r == Map("1" -> 3L, "2" -> 3L, "3" -> 3L, "4" -> 3L,
      "x" -> 1L, "y" -> 1L, "z" -> 1L))
  }

  test("triangles: triangle-free graphs (path, star hub) emit nothing") {
    val path = edges(("1", "2"), ("2", "3"), ("3", "4"))
    assert(Triangles.perNode(path, "a", "b").count() === 0)
    // a degree-10 hub with no leaf-leaf edges: the orientation must not
    // fan out deg^2 wedges into phantom triangles
    val star = edges((1 to 10).map(i => ("hub", s"leaf$i")): _*)
    assert(Triangles.perNode(star, "a", "b").count() === 0)
  }

  test("triangles: each triangle counted exactly once (book graph: shared edge)") {
    // two triangles sharing edge (1,2): (1,2,3) and (1,2,4)
    val e = edges(("1", "2"), ("1", "3"), ("2", "3"), ("1", "4"), ("2", "4"))
    val r = Triangles.perNode(e, "a", "b").as[(String, Long)].collect().toMap
    assert(r == Map("1" -> 2L, "2" -> 2L, "3" -> 1L, "4" -> 1L))
  }

  test("triangles: plan is all equi-joins — no cartesian product") {
    val e = edges(("1", "2"), ("1", "3"), ("2", "3"))
    val plan = Triangles.perNode(e, "a", "b").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  // ---------------------------------------------------------------- KCore

  test("kcore: tail chain peels one node per round; triangle core survives") {
    // triangle (1,2,3) + tail 3-4-5-6; k=2:
    // round 1 drops 6 (deg 1), round 2 drops 5, round 3 drops 4 —
    // a genuine cascade — leaving the triangle with degrees (2,2,3->2)
    val e = edges(("1", "2"), ("1", "3"), ("2", "3"),
      ("3", "4"), ("4", "5"), ("5", "6"))
    val r3 = graft.graph.KCore.peel(e, "a", "b", k = 2, rounds = 3)
      .as[(String, Long)].collect().toMap
    assert(r3 == Map("1" -> 2L, "2" -> 2L, "3" -> 3L))
    // one more round: 3's degree settles to 2; the set is now stable
    val r4 = graft.graph.KCore.peel(e, "a", "b", k = 2, rounds = 4)
      .as[(String, Long)].collect().toMap
    assert(r4 == Map("1" -> 2L, "2" -> 2L, "3" -> 2L))
    // fewer rounds = shallower peel: after 1 round only node 6 is gone
    val r1 = graft.graph.KCore.peel(e, "a", "b", k = 2, rounds = 1)
      .as[(String, Long)].collect().toMap
    assert(r1.keySet == Set("1", "2", "3", "4", "5"))
  }

  test("kcore: k above the max degree empties the graph in one round") {
    val e = edges(("1", "2"), ("2", "3"))
    assert(graft.graph.KCore.peel(e, "a", "b", k = 5, rounds = 1).count() === 0)
  }

  // ------------------------------------------------------------ LabelProp

  test("labelprop: majority wins, ties to smallest label") {
    // hub h—a, h—b, h—c with seeds a,b=5 c=7 (v%16 of 5,21,7): majority 5
    val e = edges(("5", "100"), ("21", "100"), ("7", "100"))
    val r = graft.graph.LabelProp.propagate(e, "a", "b",
      v => pmod(v.cast("long"), lit(16L)), rounds = 1)
      .as[(String, Long)].collect().toMap
    assert(r("100") == 5L) // neighbors' labels {5, 5, 7} -> 5
    assert(r("5") == 4L && r("21") == 4L && r("7") == 4L) // 100 % 16
    // two-neighbor tie {5, 7} -> smallest
    val t = graft.graph.LabelProp.propagate(
      edges(("5", "100"), ("7", "100")), "a", "b",
      v => pmod(v.cast("long"), lit(16L)), rounds = 1)
      .as[(String, Long)].collect().toMap
    assert(t("100") == 5L)
  }

  test("labelprop: fixed rounds are the contract — a bipartite path oscillates deterministically") {
    val e = edges(("1", "2"), ("2", "3")) // seeds (v%2): 1,0,1
    def run(r: Int) = graft.graph.LabelProp.propagate(e, "a", "b",
      v => pmod(v.cast("long"), lit(2L)), rounds = r)
      .as[(String, Long)].collect().toMap
    assert(run(1) == Map("1" -> 0L, "2" -> 1L, "3" -> 0L))
    assert(run(2) == Map("1" -> 1L, "2" -> 0L, "3" -> 1L))
  }

  // ---------------------------------------------------------- RandomWalks

  test("random walks: hash-indexed hops replay exactly; sinks end walks early") {
    // adj: 1 -> [2,3], 2 -> [3]; 3 is a sink
    // from 1: step1 idx = (1*48271 + 8191) % 2 = 0 -> 2; step2 from 2 -> 3; step3: sink
    // from 2: step1 -> 3; done
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "d")
    val r = graft.graph.RandomWalks.walks(e, "s", "d", len = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((1L, 1L, 2L), (1L, 2L, 3L), (2L, 1L, 3L)))
  }

  // ------------------------------------------------------------- UrlOps

  test("extractHrefs: all double-quoted hrefs in order; none elsewhere") {
    val html = """<a href="https://a.b/1">x</a><p>href= nope</p><a class="c" href="HTTP://C.D:80/2#f">y</a>"""
    val r = Seq(html).toDF("h")
      .select(UrlOps.extractHrefs(col("h")).as("u")).as[Seq[String]].head()
    assert(r == Seq("https://a.b/1", "HTTP://C.D:80/2#f"))
    assert(Seq("<p>no links</p>").toDF("h")
      .select(UrlOps.extractHrefs(col("h"))).as[Seq[String]].head().isEmpty)
  }

  test("extractAnchors: (href, text) pairs; extra attributes after href allowed") {
    val html = """<a href="https://a.b/1">one</a><img src="x"/><a href="https://a.b/2" rel="nofollow">two words</a>"""
    val r = Seq(html).toDF("h")
      .select(explode(UrlOps.extractAnchors(col("h"))).as("a"))
      .select("a.href", "a.anchor").as[(String, String)].collect().toSeq
    assert(r == Seq("https://a.b/1" -> "one", "https://a.b/2" -> "two words"))
  }

  test("hostOf: lowercases, strips port/path/query/fragment") {
    val cases = Seq(
      "https://EX.org:443/p" -> "ex.org",
      "http://m1.mirror.net/p/3" -> "m1.mirror.net",
      "https://a.b" -> "a.b",
      "https://a.b?x=1" -> "a.b",
      "https://a.b#frag" -> "a.b")
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), UrlOps.hostOf(col("u")).as("h"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, h) => assert(got(u) == h, u) }
  }

  // ------------------------------------------------------------- KMeansInt

  private def vecs(vs: (Long, Seq[Float])*) = vs.toDF("id", "emb")

  test("kmeans: two clusters, floor-mean centroids, stable after round 1") {
    // codes: 1.0->127, 0.9->114, -0.9->-114, -1.0->-127
    // seeds (lowest ids): c1=(127,127), c2=(-127,-127)
    // means: c1 = floor(241/2) = 120; c2 = floor(-241/2) = -121
    val d = vecs(
      1L -> Seq(1.0f, 1.0f), 2L -> Seq(-1.0f, -1.0f),
      3L -> Seq(0.9f, 0.9f), 4L -> Seq(-0.9f, -0.9f))
    val r = graft.sim.KMeansInt.trainAssign(d, c = 2, iters = 3)
      .as[(Long, Long, Seq[Long])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r == Map(
      1L -> ((2L, Seq(120L, 120L))),
      2L -> ((2L, Seq(-121L, -121L)))))
  }

  test("kmeans: distance ties go to the lowest cid; empty cluster keeps its seed and is unreported") {
    // seeds c1=c2=(127,127) (duplicate points), c3=(0,0): every point on
    // the duplicate goes to c1, c2 never gets a member
    val d = vecs(1L -> Seq(1.0f, 1.0f), 2L -> Seq(1.0f, 1.0f), 3L -> Seq(0.0f, 0.0f))
    val r = graft.sim.KMeansInt.trainAssign(d, c = 3, iters = 2)
      .as[(Long, Long, Seq[Long])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r == Map(
      1L -> ((2L, Seq(127L, 127L))),
      3L -> ((1L, Seq(0L, 0L)))))
  }

  // --------------------------------------------------------------- DSIR

  test("dsir: target-exclusive tokens score 0 bits; raw-only tokens score negative") {
    // 8 target docs of token "aa", 8 raw docs of token "bb" (distinct
    // hash buckets: 12804%256=4 vs 12936%256=136).
    // w(aa) = floorlog2(24+1) - floorlog2(24+1) = 0
    // w(bb) = floorlog2(0+1)  - floorlog2(24+1) = 0 - 4 = -4
    val docs = ((1 to 8).map(i => (i.toLong, "aa aa aa")) ++
      (9 to 16).map(i => (i.toLong, "bb bb bb"))).toDF("doc_id", "text")
    val r = Dsir.importanceSelect(docs, col("doc_id") <= 8, "doc_id", "text",
        dim = 256, tauMilli = -2000L)
      .select("doc_id", "logw_milli", "keep")
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, lw, k) => id -> ((lw, k)) }.toMap
    (1 to 8).foreach(i => assert(r(i.toLong) == ((0L, true)), i))
    (9 to 16).foreach(i => assert(r(i.toLong) == ((-4000L, false)), i))
  }

  test("dsir: length normalization — same token mix, different lengths, same rate") {
    val docs = Seq((1L, "aa aa"), (2L, "aa aa aa aa aa aa")).toDF("doc_id", "text")
    val r = Dsir.importanceSelect(docs, lit(true), "doc_id", "text")
      .select("doc_id", "logw_milli").as[(Long, Long)].collect().toMap
    assert(r(1L) == r(2L))
  }
}
