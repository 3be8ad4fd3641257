package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.Corpus
import graft.link.Linker

class TrieLinkerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dict(rows: (String, String, String, Int)*) =
    rows.toDF("alias", "entity_id", "entity_label", "priority")

  test("tokenize mirrors tokens(Column) byte-identically on the full corpus") {
    val pages = Corpus.pageText(spark, TestSpark.sf0001).select("url", "text")
    val colToks = pages.select($"url", Linker.tokens($"text").as("t"))
      .as[(String, Seq[String])].collect().toMap
    pages.as[(String, String)].collect().foreach { case (url, text) =>
      assert(Linker.tokenize(text).toSeq == colToks(url), s"url=$url")
    }
    // edge cases
    assert(Linker.tokenize("").toSeq == Seq(""))
    assert(Linker.tokenize("  .,;:  ").toSeq == Seq(""))
    assert(Linker.tokenize("a-b c.d, e: f;").toSeq == Seq("a-b", "cd", "e", "f"))
  }

  test("trie matcher equals uni+bigram join matcher on a <=2-token dictionary") {
    val pages = Corpus.pageText(spark, TestSpark.sf0001).select("url", "text")
    val d = Corpus.aliasDict(spark, TestSpark.sf0001)
    val trie = Linker.mentions(pages, d)
      .select("url", "pos", "alias", "entity_id", "entity_label")
    val join = Linker.mentionsJoin(pages, d)
      .select("url", "pos", "alias", "entity_id", "entity_label")
    assert(trie.exceptAll(join).isEmpty && join.exceptAll(trie).isEmpty)
  }

  test("trie matches aliases of 3+ tokens, overlaps included") {
    val pages = Seq(
      ("u1", "Order placed by Customer#7 from UNITED STATES with priority 4-NOT SPECIFIED now.")
    ).toDF("url", "text")
    val d = dict(
      ("Customer#7 from UNITED STATES", "CL:7", "cust_loc", 0), // 4 tokens
      ("with priority 4-NOT SPECIFIED", "PRIO:4", "priority", 0), // 4 tokens
      ("UNITED STATES", "N:24", "nation", 0), // nested inside the 4-token alias
      ("Customer#7", "C:7", "customer", 0))
    val m = Linker.mentions(pages, d)
      .select("alias", "entity_id", "pos").as[(String, String, Int)].collect().toSet
    assert(m == Set(
      ("Customer#7 from UNITED STATES", "CL:7", 3),
      ("with priority 4-NOT SPECIFIED", "PRIO:4", 7),
      ("UNITED STATES", "N:24", 5),
      ("Customer#7", "C:7", 3)))
  }

  test("trie emits every candidate of an ambiguous alias (no drop)") {
    val pages = Seq(("u1", "the red widget here")).toDF("url", "text")
    val d = Seq(
      ("red widget", "P:1", "product"),
      ("red widget", "P:2", "product")).toDF("alias", "entity_id", "entity_label")
    val m = Linker.mentionsTrie(pages, d)
      .select("entity_id").as[String].collect().toSet
    assert(m == Set("P:1", "P:2"))
  }

  test("TF-IDF rerank picks the context-matching entity, not the min id") {
    // Two candidates for alias "red widget": P:9 whose profile matches the
    // page context (brand B7, type HEAVY), P:1 (min id) whose profile does
    // not. Rare context tokens carry high idf weight, so P:9 must win.
    val pages = Seq(
      ("u1", "Review of red widget by B7 type HEAVY size 3"),
      ("u2", "Review of red widget by B2 type LIGHT size 5"),
      ("u3", "Review of blue bolt by B9 type LIGHT size 9")
    ).toDF("url", "text")
    val profiles = Seq(
      ("P:1", "red widget B2 LIGHT size 5"),
      ("P:9", "red widget B7 HEAVY size 3"),
      ("P:5", "blue bolt B9 LIGHT size 9")
    ).toDF("entity_id", "ptext")
    val cands = Seq(
      ("u1", "red widget", "P:1"), ("u1", "red widget", "P:9"),
      ("u2", "red widget", "P:1"), ("u2", "red widget", "P:9")
    ).toDF("url", "alias", "entity_id")
    val r = Linker.rerank(cands, pages, profiles)
      .as[(String, String, String)].collect().map { case (u, _, e) => u -> e }.toMap
    assert(r == Map("u1" -> "P:9", "u2" -> "P:1"))
  }

  test("rerank ties break on ascending entity_id (identical profiles)") {
    val pages = Seq(("u1", "x alpha beta y")).toDF("url", "text")
    val profiles = Seq(
      ("P:b", "alpha beta"), ("P:a", "alpha beta")).toDF("entity_id", "ptext")
    val cands = Seq(
      ("u1", "alpha beta", "P:b"), ("u1", "alpha beta", "P:a"))
      .toDF("url", "alias", "entity_id")
    val r = Linker.rerank(cands, pages, profiles).as[(String, String, String)].collect()
    assert(r.length == 1 && r(0)._3 == "P:a")
  }

  test("rerank keeps a zero-overlap candidate set (cos=0) deterministic") {
    val pages = Seq(("u1", "nothing shared at all")).toDF("url", "text")
    val profiles = Seq(("P:2", "qq ww"), ("P:1", "zz yy")).toDF("entity_id", "ptext")
    val cands = Seq(("u1", "ghost", "P:2"), ("u1", "ghost", "P:1"))
      .toDF("url", "alias", "entity_id")
    val r = Linker.rerank(cands, pages, profiles).as[(String, String, String)].collect()
    assert(r.length == 1 && r(0)._3 == "P:1")
  }

  test("reviews fixture: ranked winner is the reviewed part when context is unique") {
    val rv = Corpus.reviews(spark, TestSpark.sf0001)
    val cands = Linker.mentionsTrie(rv, Corpus.reviewDict(spark, TestSpark.sf0001))
      .select("url", "alias", "entity_id").distinct()
    val won = Linker.rerank(cands, rv, Corpus.partProfiles(spark, TestSpark.sf0001))
    // every review page resolves its alias to exactly one part
    val perPage = won.groupBy("url", "alias").count().filter($"count" > 1).count()
    assert(perPage == 0)
    // the winner must share the page's full context (name+brand+type+size):
    // i.e. the winner's profile tokens minus template words all appear in text
    val joined = won.join(rv, "url")
      .join(Corpus.partProfiles(spark, TestSpark.sf0001), "entity_id")
      .withColumn("missing",
        size(array_except(split($"ptext", " "), split($"text", " "))))
    assert(joined.filter($"missing" > 0).count() == 0)
  }
}
