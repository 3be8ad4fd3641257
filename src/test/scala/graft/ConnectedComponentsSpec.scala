package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cc.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Runs BOTH the single-task union-find path (default threshold) and
    * the distributed star-contraction path (threshold 0) and asserts
    * they agree — every graph shape tests both implementations. */
  private def cc(edges: Seq[(String, String)], verts: Seq[String] = Nil) = {
    val e = edges.toDF("src", "dst")
    val v = if (verts.isEmpty) None else Some(verts.toDF("v"))
    val local = ConnectedComponents.run(spark, e, v)
      .as[(String, String)].collect().toMap
    val dist = ConnectedComponents.run(spark, e, v, localThreshold = 0L)
      .as[(String, String)].collect().toMap
    assert(local == dist, "local union-find and star contraction disagree")
    local
  }

  test("two separate components") {
    val m = cc(Seq(("a", "b"), ("b", "c"), ("x", "y")))
    assert(m == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("long path converges in logarithmic rounds (pointer jumping)") {
    val n = 300
    val ids = (0 until n).map(i => f"v$i%04d")
    val m = cc(ids.sliding(2).map(p => (p(0), p(1))).toSeq)
    assert(m.size == n && m.values.toSet == Set("v0000"))
  }

  test("diamond DAG is one component") {
    val m = cc(Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")))
    assert(m.values.toSet == Set("a"))
  }

  test("isolated vertices become singleton components via vertex universe") {
    val m = cc(Seq(("a", "b")), verts = Seq("a", "b", "z"))
    assert(m("z") == "z" && m("b") == "a")
  }

  test("component id is lexicographic min of string ids") {
    val m = cc(Seq(("PARTRAW:99", "PARTRAW:100")))
    assert(m.values.toSet == Set("PARTRAW:100"))
  }

  test("cycle converges") {
    val m = cc(Seq(("a", "b"), ("b", "c"), ("c", "a")))
    assert(m.values.toSet == Set("a"))
  }
}
