package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.textops.{DedupOps, UrlOps}

/** Round-6 training-data ops: benchmark k-gram decontamination, URL
  * canonicalization, and the filter funnel — hand-computed goldens on
  * tiny corpora (the oracle checks the full fixture; these pin the
  * SEMANTICS so an oracle-and-engine-agree-but-both-wrong drift is
  * caught at the unit level).
  */
class TrainingDataOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- decontamination -------------------------------------------

  test("decontaminate: exact overlap fractions and flagging on a hand corpus") {
    // k=3 over 6-token docs -> 4 windows each (all distinct by construction)
    val docs = Seq(
      (1L, "a b c d e f"),   // benchmark member: all 4 windows match itself
      (2L, "a b c d x y"),   // windows: abc bcd cdx dxy -> 2 of 4 match
      (3L, "p q r s t u"),   // 0 of 4 match
      (4L, "z z")            // < k tokens: absent from output
    ).toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" === 1L)
    val r = DedupOps.decontaminate(docs, bench, "doc_id", "text",
        k = 3, tauMilli = 500)
      .select("doc_id", "n_grams", "n_matched", "contam_milli", "flagged")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) === ((4L, 4L, 1000L, true)))
    assert(r(2L) === ((4L, 2L, 500L, true)))  // boundary: >= tau flags
    assert(r(3L) === ((4L, 0L, 0L, false)))
    assert(!r.contains(4L))
  }

  test("decontaminate: duplicated shingles count once (distinct-gram fraction)") {
    val docs = Seq(
      (1L, "a b c a b c a b c"), // distinct 3-windows: abc bca cab -> 3
      (2L, "a b c")              // benchmark: the single window abc
    ).toDF("doc_id", "text")
    val r = DedupOps.decontaminate(docs, docs.filter($"doc_id" === 2L),
        "doc_id", "text", k = 3, tauMilli = 200)
      .filter($"doc_id" === 1L)
      .select("n_grams", "n_matched", "contam_milli", "flagged")
      .as[(Long, Long, Long, Boolean)].head()
    assert(r === ((3L, 1L, 333L, true)))
  }

  // ---- URL canonicalization --------------------------------------

  private def canon(u: String): String =
    Seq(u).toDF("u").select(UrlOps.canonicalizeUrl($"u")).as[String].head()

  test("url canon: case, default port, fragment, trailing slash, utm params") {
    // the five variant shapes q_url_canon builds
    assert(canon("https://ex.org/42") === "https://ex.org/42")
    assert(canon("HTTPS://EX.ORG:443/42#frag") === "https://ex.org/42")
    assert(canon("https://ex.org/42/") === "https://ex.org/42")
    assert(canon("https://ex.org/42?utm_source=x&b=2&a=1")
      === "https://ex.org/42?a=1&b=2")
    // a REAL port survives
    assert(canon("https://ex.org:8080/42") === "https://ex.org:8080/42")
  }

  test("url canon: edge shapes — bare host, root slash, http:80, all-utm query") {
    assert(canon("http://Ex.Org") === "http://ex.org/")
    assert(canon("http://ex.org/") === "http://ex.org/")
    assert(canon("http://ex.org:80/a") === "http://ex.org/a")
    assert(canon("http://ex.org:8080/a") === "http://ex.org:8080/a")
    // dropping every param drops the '?'
    assert(canon("https://ex.org/a?utm_x=1&utm_y=2") === "https://ex.org/a")
    // params sort in codepoint order; deep paths keep inner slashes
    assert(canon("https://ex.org/a/b/c/?z=1&y=2#x") === "https://ex.org/a/b/c?y=2&z=1")
  }

  test("url canon is idempotent on its own output") {
    val raws = Seq("HTTPS://EX.ORG:443/1#f", "https://ex.org/2?utm_a=1&b=2",
      "http://Ex.Org:80/x/", "https://ex.org:8080/y")
    raws.foreach { u => assert(canon(canon(u)) === canon(u)) }
  }

  // ---- filter funnel ---------------------------------------------

  test("filter funnel: stage counts are monotonically non-increasing and dedup collapses clusters") {
    val fn = graft.queries.TextQueries.queries("q_filter_funnel")
    val rows = fn(spark, TestSpark.sf0001)
      .select("stage_idx", "n_docs", "n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"stage ${b._1} docs grew: $a -> $b")
      assert(b._3 <= a._3, s"stage ${b._1} tokens grew: $a -> $b")
    }
    // the dup injection guarantees the dedup stage strictly drops rows
    // (every doc_id % 5 == 0 'en' survivor has an injected twin)
    assert(rows(4)._2 < rows(3)._2)
    // raw = documents + injected fifth
    val d = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val n = d.count(); val n5 = d.filter(pmod($"doc_id", lit(5)) === 0).count()
    assert(rows(0)._2 === n + n5)
  }

  // ---- executor-side trie build ----------------------------------

  test("mentionsTrie builds the trie on executors (per-JVM broadcast cache), driver ships flat rows") {
    val before = graft.link.TokenTrie.cacheSize
    val pages = Seq(("u1", "alpha beta gamma"), ("u2", "beta gamma delta"))
      .toDF("url", "text")
    val dict = Seq(("beta gamma", "E1", "thing", 0))
      .toDF("alias", "entity_id", "entity_label", "priority")
    val m = graft.link.Linker.mentions(pages, dict)
      .select("url", "pos").as[(String, Int)].collect().toSet
    assert(m === Set(("u1", 1), ("u2", 0)))
    // local mode: executor JVM == test JVM, so the lazily-built trie is
    // observable in the cache (at least one new entry, bounded total)
    assert(graft.link.TokenTrie.cacheSize >= math.min(before + 1, 1))
    assert(graft.link.TokenTrie.cacheSize <= 4)
  }

  // ---- near-dup clustering ----------------------------------------

  test("dupClusters: chains collapse transitively, singletons self-cluster") {
    // near-dup is NOT transitive: pairs form the chain 1~2~3 plus 5~6;
    // docs 4 and 7 appear in no pair
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id1", "id2")
    val docs = (1L to 7L).toDF("doc_id")
    val r = graft.textops.DedupOps.dupClusters(pairs, docs, "doc_id")
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) === ((1L, 3L, true)))
    assert(r(2L) === ((1L, 3L, false)))
    assert(r(3L) === ((1L, 3L, false)))  // 1 and 3 never paired directly
    assert(r(4L) === ((4L, 1L, true)))
    assert(r(5L) === ((5L, 2L, true)))
    assert(r(6L) === ((5L, 2L, false)))
    assert(r(7L) === ((7L, 1L, true)))
  }

  // ---- budget sampling --------------------------------------------

  // MINSTD keys: k(1)=48271, k(100000)=532132706, k(66000)=1038402353
  // -> sample order within a source is 1, 100000, 66000 (NOT id order)

  test("budgetSample: cut happens in hash order, inclusive boundary") {
    val d = Seq(
      ("A", 66000L, 10L), ("A", 100000L, 5L), ("A", 1L, 3L),
      ("B", 2L, 7L)
    ).toDF("source", "doc_id", "n_tokens")
    val r = graft.textops.SampleOps
      .budgetSample(d, "doc_id", "n_tokens", "source", budgetTokens = 8L)
      .select("source", "doc_id", "cum_tokens")
      .as[(String, Long, Long)].collect().toSet
    // A: cum 3 (id 1), 8 (id 100000, == budget kept), 18 (id 66000, cut)
    assert(r === Set(("A", 1L, 3L), ("A", 100000L, 8L), ("B", 2L, 7L)))
  }

  test("budgetSample: bucket count never changes the sample") {
    val d = Seq.tabulate(60) { i =>
      (s"s${i % 3}", i.toLong * 7919L, (i % 9 + 1).toLong)
    }.toDF("source", "doc_id", "n_tokens")
    def run(b: Int) = graft.textops.SampleOps
      .budgetSample(d, "doc_id", "n_tokens", "source", 40L, buckets = b)
      .select("source", "doc_id", "n_tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    val one = run(1) // single bucket == the naive one-window semantics
    assert(one.nonEmpty)
    assert(run(64) === one)
    assert(run(7) === one)
  }

  // ---- stratified sampling ----------------------------------------

  test("stratifiedSample: strict-< milli threshold, rate 0 and 1000 ends") {
    val d = Seq(1L, 2L, 3L).toDF("doc_id")
    def keep(rate: Long) = graft.textops.SampleOps
      .stratifiedSample(d, "doc_id", lit(rate))
      .as[Long].collect().toSet
    assert(keep(0L) === Set.empty)
    assert(keep(1000L) === Set(1L, 2L, 3L))
    // k(1) % 1000 = 271: kept at rate 272, dropped at 271 (strict <)
    assert(keep(272L).contains(1L))
    assert(!keep(271L).contains(1L))
  }

  // ---- span excision ----------------------------------------------

  test("exciseRepeatedSpans: keep-one — first occurrence survives, rest cut") {
    val docs = Seq(
      (1L, "a b c d e f g h"),  // owns the global-first windows
      (2L, "x y a b c d z w"),  // shares span "a b c d" -> excised here
      (3L, "a b c d e f g h"),  // exact twin -> fully excised
      (4L, "p q r")             // no repeats -> untouched
    ).toDF("doc_id", "text")
    val r = graft.textops.DedupOps
      .exciseRepeatedSpans(docs, "doc_id", "text", k = 3)
      .select("doc_id", "n_before", "n_removed", "text_clean")
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) === ((8L, 0L, "a b c d e f g h")))
    assert(r(2L) === ((8L, 4L, "x y z w")))
    assert(r(3L) === ((8L, 8L, "")))
    assert(r(4L) === ((3L, 0L, "p q r")))
  }

  // ---- curation flagship ------------------------------------------

  test("curated corpus: every stage's invariant holds on the fixture") {
    val r = graft.queries.TextQueries.queries("q_curated_corpus")(
        spark, TestSpark.sf0001)
      .select("source", "doc_id", "n_tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    // exact dedup: an injected +1000000 twin can never outrank its
    // original (same text -> same fingerprint, min doc_id wins)
    assert(r.forall(_._2 < 1000000L))
    // decontamination: benchmark members self-flag at 1000 milli
    assert(r.forall(_._2 % 37 != 0))
    // budget: inclusive 600-token cut per source, cum consistent
    assert(r.forall(_._4 <= 600L))
    r.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sum === rows.map(_._4).max)
    }
    // quality gate: every survivor has >= 30 tokens
    assert(r.forall(_._3 >= 30L))
  }

  // ---- PII redaction ----------------------------------------------

  test("pii redact: emails and bare IPv4s masked, lookalikes survive") {
    val d = Seq(
      "mail a.b+c@x.org then 1.2.3.4 done",
      "no pii here",
      "ver 1.2.3.4567 is not an ip",      // 4th octet too long
      "trailing dot x@y.org. stays"       // domain stops before the dot
    ).toDF("text")
    val r = d.select(
        graft.textops.PiiOps.redact(col("text")).as("t"),
        graft.textops.PiiOps.emailCount(col("text")).as("e"),
        graft.textops.PiiOps.ipv4Count(col("text")).as("i"))
      .as[(String, Int, Int)].collect()
    assert(r(0) === (("mail <EMAIL> then <IP> done", 1, 1)))
    assert(r(1) === (("no pii here", 0, 0)))
    assert(r(2) === (("ver 1.2.3.4567 is not an ip", 0, 0)))
    assert(r(3) === (("trailing dot <EMAIL>. stays", 1, 0)))
  }

  test("stripBoilerplate: site-wide lines excised, order kept, other sites untouched") {
    val lines = Seq(
      // site A: "NAV" on all 3 docs (df=3 >= 2, 3*2 >= 3) -> removed
      (1L, "a", 0, "NAV"), (1L, "a", 1, "body one"), (1L, "a", 2, "tail"),
      (2L, "a", 0, "NAV"), (2L, "a", 1, "body two"),
      (3L, "a", 0, "NAV"), (3L, "a", 1, "body one"), // "body one" df=2, 2*2 >= 3 -> removed too
      // site B: single doc; its "NAV" has df=1 < minDf -> kept
      (9L, "b", 0, "NAV"), (9L, "b", 1, "body nine")
    ).toDF("doc_id", "site", "pos", "line")
    val r = graft.textops.TextOps.stripBoilerplate(lines)
      .as[(Long, String, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == (("tail", 2L)))            // NAV + "body one" removed
    assert(r(2L) == (("body two", 1L)))
    assert(r(3L) == (("", 2L)))                // everything site-wide
    assert(r(9L) == (("NAV\nbody nine", 0L)))  // df=1 on site b survives
  }

  test("packSequences: straddling docs split exactly; lengths conserve") {
    val docs = Seq((1L, 5L), (2L, 10L), (3L, 3L)).toDF("doc_id", "n_tokens")
    val r = graft.textops.SampleOps
      .packSequences(docs, "doc_id", "n_tokens", seqLen = 8, buckets = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // layout: doc1 [0,5) doc2 [5,15) doc3 [15,18); cuts at 8 and 16
    assert(r == Set(
      (0L, 1L, 0L, 0L, 5L),
      (0L, 2L, 0L, 5L, 3L), (1L, 2L, 3L, 0L, 7L),
      (1L, 3L, 0L, 7L, 1L), (2L, 3L, 1L, 0L, 2L)))
  }

  test("packSequences invariants on the fixture: per-doc and per-seq token conservation") {
    val d = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), graft.textops.TextOps.tokenCount(col("text")).as("n"))
    val packed = graft.textops.SampleOps.packSequences(d, "doc_id", "n", seqLen = 128)
    val perDoc = packed.groupBy("doc_id").agg(sum("len").as("s"))
      .join(d, "doc_id").filter(col("s") =!= col("n")).count()
    assert(perDoc == 0, "per-doc segment lengths must sum to n_tokens")
    val maxSeq = packed.agg(max("seq_id")).head.getLong(0)
    val short = packed.filter(col("seq_id") < maxSeq)
      .groupBy("seq_id").agg(sum("len").as("s"))
      .filter(col("s") =!= 128).count()
    assert(short == 0, "every non-final sequence must hold exactly seqLen tokens")
  }

  test("bigramSurprisal: hand-computed bit counts") {
    // pairs: (a,b) x2, (a,c) x1 -> uc(a)=3; floorlog2: 3->1, 2->1, 1->0
    val r = graft.textops.LmScore.bigramSurprisal(
        Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(r == Set((1L, 1L, 0L, 0L), (2L, 1L, 0L, 0L), (3L, 1L, 1L, 1000L)))
  }

  test("qualityScoreMilli: hand-computed golden weights and sums") {
    // code('a')=97 -> bucket 97 -> w=-773; code('b')=98 -> w=434
    val r = Seq((1L, "a b"), (2L, "the of and"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.textops.TextOps.qualityScoreMilli(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(r(1L) == -339L) // -773 + 434
    assert(r(2L) == 1178L) // 196 + 571 + 411
  }

  test("qualityScoreMilli: fixture splits into both verdicts, score bounded by n_tokens*1000") {
    val d = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text"),
        graft.textops.TextOps.qualityScoreMilli(col("text")).as("s"),
        graft.textops.TextOps.tokenCount(col("text")).as("n"))
    assert(d.filter(col("s") >= 0).count() > 0)
    assert(d.filter(col("s") < 0).count() > 0)
    assert(d.filter(abs(col("s")) > col("n") * 1000).count() == 0)
  }
}
