package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.textops.{DedupOps, TextOps}
import graft.sim.Knn

class DedupSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (4L, "completely different words appear in this sentence here"),
    (5L, "short text")
  ).toDF("doc_id", "text")

  test("exact dedup finds the duplicate cluster") {
    val r = DedupOps.exactDedup(docs, "doc_id", "text")
      .select("canonical_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(r.contains((1L, 2L)))
    assert(r.size == 4)
  }

  test("ngram jaccard finds exact and near dup pairs, not unrelated") {
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L))) // identical
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L))) // near
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH candidates + exact verify == exact jaccard pairs on this corpus") {
    val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val mh = DedupOps.minhashNearDupPairs(docs, "doc_id", "text", 3, 64, 2, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(mh.subsetOf(exact), "precision must be 1 (exact verification)")
    assert(exact.subsetOf(mh), "recall shortfall vs exact jaccard")
  }

  test("simhash hamming: identical docs distance 0; results respect the bound") {
    // banding on 4 chunks guarantees recall only for hamming <= 3
    // (pigeonhole); identical docs always share every chunk.
    val r = DedupOps.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 16)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(r((1L, 3L)) == 0)
    assert(r.values.forall(_ <= 16))
    // near-dup texts have closer signatures than unrelated ones
    val s1 = DedupOps.simhash64(docs.filter($"doc_id" === 1).select("text").as[String].head().split(" ").toSeq)
    val s2 = DedupOps.simhash64(docs.filter($"doc_id" === 2).select("text").as[String].head().split(" ").toSeq)
    val s4 = DedupOps.simhash64(docs.filter($"doc_id" === 4).select("text").as[String].head().split(" ").toSeq)
    assert(java.lang.Long.bitCount(s1 ^ s2) < java.lang.Long.bitCount(s1 ^ s4))
  }

  test("simhash64 is deterministic and order-sensitive only via token multiset") {
    val a = DedupOps.simhash64(Seq("x", "y", "z"))
    val b = DedupOps.simhash64(Seq("x", "y", "z"))
    assert(a == b)
  }

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.95f, 0.05f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("id", "emb")

  test("brute-force knn: nearest neighbor correct") {
    val r = Knn.bruteForceTopK(vecs, vecs, 1)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(r(0L) == 1L && r(1L) == 0L && r(2L) == 3L && r(3L) == 2L)
  }

  test("cosine near-dup pairs at high tau") {
    val r = Knn.cosineNearDupPairs(vecs, 0.99)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(r == Set((0L, 1L), (2L, 3L)))
  }

  test("LSH knn returns a subset ranking consistent with brute force inside buckets") {
    val corpus = Corpus64.df(spark)
    val brute = Knn.bruteForceTopK(corpus, corpus, 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Knn.lshTopK(corpus, dim = 64, nPlanes = 4, k = 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall > 0.3, s"bucketed recall sanity: $recall") // coarse quantizer, sanity only
  }

  test("fingerprint/token stats golden") {
    val r = Seq(Tuple1("ab cde")).toDF("text")
      .select(TextOps.fingerprint(TextOps.tokens(col("text")))).as[Long].head()
    assert(r == 21807L) // matches DuckDB list_reduce oracle formula
  }

  test("langid picks the language with most stopword hits") {
    val cases = Seq(
      ("the cat and the dog is here", "en"),
      ("el perro y la casa de que", "es"),
      ("der hund und die katze ist", "de"),
      ("nohits atall", "en")) // tie -> en priority
    cases.foreach { case (txt, want) =>
      val got = Seq(Tuple1(txt)).toDF("text")
        .select(TextOps.langId(TextOps.tokens(col("text")))).as[String].head()
      assert(got == want, txt)
    }
  }
}

/** Deterministic 64-dim corpus for LSH tests. */
object Corpus64 {
  def df(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    (0 until 100).map { i =>
      val arr = Array.tabulate(64)(d =>
        (((i * 37 + d * 101) % 97) / 97.0f) - 0.5f)
      (i.toLong, arr)
    }.toDF("id", "emb")
  }
}
