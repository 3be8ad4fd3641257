package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.link.Linker

class LinkerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dict(rows: (String, String, String, Int)*) =
    rows.toDF("alias", "entity_id", "entity_label", "priority")

  test("resolveDict picks min-priority entity per alias") {
    val d = dict(("cold widget", "P:9", "product", 9), ("cold widget", "P:3", "product", 3))
    val r = Linker.resolveDict(d).collect()
    assert(r.length == 1 && r(0).getString(1) == "P:3")
  }

  test("resolveDict drops alias ambiguous at min priority (P5 multi-map drop)") {
    val d = dict(
      ("amb", "P:1", "product", 1), ("amb", "P:2", "product", 1),
      ("ok", "P:5", "product", 1))
    val r = Linker.resolveDict(d).collect()
    assert(r.map(_.getString(0)).toSet == Set("ok"))
  }

  test("driver-side rank-1 resolution equals the relational resolveDict on the full corpus dict") {
    val d = graft.fixtures.Corpus.aliasDict(spark, "/root/testdata/sf0.001")
      .unionByName(dict( // edge shapes: ambiguity, priority fallback, label tie
        ("amb", "P:1", "product", 1), ("amb", "P:2", "product", 1),
        ("fb", "P:9", "zz", 9), ("fb", "P:3", "aa", 3),
        ("lbl", "P:7", "b", 1), ("lbl", "P:7", "a", 1)).toDF())
    val relational = Linker.resolveDict(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
    val raw = d.select($"alias", $"entity_id", $"entity_label",
        $"priority".cast("int"))
      .as[(String, String, String, Int)].collect()
    val local = Linker.resolveDictLocal(raw).sorted
    assert(local.toSeq == relational.toSeq)
  }

  test("mentions finds unigrams and bigrams with positions, no false cross matches") {
    val pages = Seq(
      ("u1", "Items: cold widget, small bolt and Customer#01 too.")
    ).toDF("url", "text")
    val d = dict(
      ("cold widget", "P:1", "product", 1),
      ("small bolt", "P:2", "product", 1),
      ("widget small", "P:99", "product", 1), // would need cross-boundary match
      ("Customer#01", "C:1", "customer", 0))
    val m = Linker.mentions(pages, d)
      .select("alias", "entity_id", "pos").as[(String, String, Int)].collect().toSet
    // tokens: Items cold widget small bolt and Customer#01 too
    assert(m == Set(
      ("cold widget", "P:1", 1),
      ("widget small", "P:99", 2), // adjacency after ','-strip IS a bigram; documents tokenizer semantics
      ("small bolt", "P:2", 3),
      ("Customer#01", "C:1", 6)))
  }

  test("tokenizer strips sentence punctuation only") {
    val pages = Seq(("u", "a-b c.d, e: f;")).toDF("url", "text")
    val toks = pages.select(Linker.tokens($"text")).as[Seq[String]].head()
    assert(toks == Seq("a-b", "cd", "e", "f"))
  }

  test("mentions on single-token page emits no bigrams") {
    val pages = Seq(("u", "solo")).toDF("url", "text")
    val d = dict(("solo", "X:1", "x", 1))
    assert(Linker.mentions(pages, d).count() == 1)
  }
}
