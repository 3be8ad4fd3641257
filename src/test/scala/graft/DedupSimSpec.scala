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

  test("repeatedSpans finds an injected 60-token duplicated span exactly") {
    // two docs that share ONLY a 60-token span; every other token is
    // unique to its doc, so no window outside the span can be hot
    val span = (0 until 60).map(i => s"shared$i").mkString(" ")
    val d1 = ((0 until 40).map(i => s"a$i") :+ span).++(
      (40 until 80).map(i => s"a$i")).mkString(" ")
    val d2 = ((0 until 30).map(i => s"b$i") :+ span).++(
      (30 until 60).map(i => s"b$i")).mkString(" ")
    val two = Seq((10L, d1), (20L, d2)).toDF("doc_id", "text")
    val spans = DedupOps.repeatedSpans(two, "doc_id", "text", k = 20)
      .as[(Long, Long, Long)].collect().toSet
    // doc 10: span tokens occupy [40, 100); hot window starts 40..80
    // doc 20: span tokens occupy [30, 90); hot window starts 30..70
    assert(spans == Set((10L, 40L, 60L), (20L, 30L, 60L)))
  }

  test("repeatedSpans: no cross-doc repeat -> no spans; whole-doc dup -> whole-doc span") {
    val uniq = Seq(
      (1L, (0 until 30).map(i => s"x$i").mkString(" ")),
      (2L, (0 until 30).map(i => s"y$i").mkString(" "))).toDF("doc_id", "text")
    assert(DedupOps.repeatedSpans(uniq, "doc_id", "text", k = 8).isEmpty)
    val txt = (0 until 25).map(i => s"w$i").mkString(" ")
    val dup = Seq((1L, txt), (2L, txt)).toDF("doc_id", "text")
    val r = DedupOps.repeatedSpans(dup, "doc_id", "text", k = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((1L, 0L, 25L), (2L, 0L, 25L)))
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
    def sig(id: Long): Long = docs.filter($"doc_id" === id)
      .select(DedupOps.simhashSignature(col("text"))).as[Long].head()
    val (s1, s2, s4) = (sig(1L), sig(2L), sig(4L))
    assert(java.lang.Long.bitCount(s1 ^ s2) < java.lang.Long.bitCount(s1 ^ s4))
  }

  test("simhash signature is deterministic and fits in 31 bits") {
    val d = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    val sigs = d.select(DedupOps.simhashSignature(col("text"))).as[Long].collect()
    assert(sigs(0) == sigs(1) && sigs(0) >= 0 && sigs(0) < (1L << 31))
  }

  test("tokenCode matches the hand-rolled polynomial fold") {
    // "ab" -> ((0*131+97)%m*131+98)%m = 12805 (matches the DuckDB
    // list_reduce form in the q_minhash oracle)
    val c = Seq(Tuple1("ab")).toDF("t")
      .select(DedupOps.tokenCode(col("t"), 1048573L)).as[Long].head()
    assert(c == (97L * 131 + 98) % 1048573)
    val empty = Seq(Tuple1("")).toDF("t")
      .select(DedupOps.tokenCode(col("t"), 1048573L)).as[Long].head()
    assert(empty == 0L)
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

  test("LSH knn recall >= 0.8 vs brute force on the 64-dim fixture") {
    val corpus = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val brute = Knn.bruteForceTopK(corpus, corpus, 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Knn.lshTopK(corpus, k = 5,
        nPlanes = 6, nTables = 8, maxBucket = 4096, probe = true)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"multi-table+probe LSH recall: $recall")
  }

  test("LSH near-dup pairs: exact precision (subset of brute force) and recall on the 64-dim fixture") {
    val corpus = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val brute = Knn.cosineNearDupPairs(corpus, tau = 0.30)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = Knn.lshNearDupPairs(corpus, tau = 0.30)
      .as[(Long, Long)].collect().toSet
    // precision is EXACT by construction: every candidate is verified
    // with the same cosine arithmetic as the brute-force path
    assert(lsh.subsetOf(brute), "LSH near-dup emitted a non-near-dup pair")
    assert(brute.nonEmpty && lsh.nonEmpty)
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    info(s"LSH near-dup recall at tau=0.30: $recall (${lsh.size}/${brute.size})")
    assert(recall >= 0.5, s"LSH near-dup recall at tau=0.30: $recall")
  }

  test("IVF knn recall >= 0.8 vs brute force on the 64-dim fixture") {
    val corpus = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val brute = Knn.bruteForceTopK(corpus, corpus, 5)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = graft.sim.Ivf.ivfTopK(corpus, dim = 64, k = 5,
        c = 16, iters = 5, nprobe = 8)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF(nprobe=8/16) recall: $recall")
  }

  test("IVF inverted lists cover the corpus; probes bound candidate work") {
    val corpus = Corpus64.df(spark)
    val cents = graft.sim.Ivf.trainCentroids(corpus, dim = 64, c = 8, iters = 3)
    assert(cents.length == 8 && cents.forall(_.length == 64))
    // nprobe=1 still returns a ranking for every query (its own cell
    // has at least the seed members); nprobe=c equals exact brute force
    val full = graft.sim.Ivf.ivfTopK(corpus, 64, 3, c = 8, iters = 3,
      nprobe = 8, centroids = Some(cents))
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Knn.bruteForceTopK(corpus, corpus, 3)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == brute, "nprobe = C must equal exact search")
  }

  test("autoC scales centroid count with corpus size; inverted-list cap bounds candidates") {
    import graft.sim.Ivf
    assert(Ivf.autoC(500L, 64L) == 8)
    assert(Ivf.autoC(1L << 20, 2048L) == 512)
    assert(Ivf.autoC(10L, 2048L) == 4)                    // floor
    assert(Ivf.autoC(1000000000000L, 2048L) == (1 << 20)) // ceiling clamp
    // maxList=1, nprobe=2: every probed list holds at most ONE member,
    // so no query can see more than 2 candidates regardless of k.
    val corpus = Corpus64.df(spark)
    val capped = Ivf.ivfTopK(corpus, dim = 64, k = 5, c = 4, iters = 2,
        nprobe = 2, maxList = 1)
      .groupBy("vec_id").count().select("count").as[Long].collect()
    assert(capped.nonEmpty && capped.forall(_ <= 2L))
  }

  test("autoPlanes bounds expected bucket size by corpus scale") {
    assert(Knn.autoPlanes(1000L, 1024L) == 4) // floor
    assert(Knn.autoPlanes(1L << 20, 1024L) == 10)
    assert(Knn.autoPlanes(1L << 30, 1024L) == 20)
    // 10^12 rows -> 2^30 buckets: within-bucket work stays ~targetBucket²
    assert(Knn.autoPlanes(1000000000000L, 1024L) == 30)
  }

  test("LSH per-bucket cap truncates deterministically by id") {
    val corpus = Corpus64.df(spark)
    // cap of 1 leaves at most one corpus-side member per bucket: every
    // query can only ever see the lowest-id member of each bucket
    val lsh = Knn.lshTopK(corpus, k = 100,
        nPlanes = 2, nTables = 1, maxBucket = 1, probe = false)
      .select("neighbor_id").as[Long].collect().toSet
    // with 2 planes there are at most 4 buckets -> at most 4 distinct
    // surviving corpus-side members
    assert(lsh.size <= 4)
  }

  test("fingerprint/token stats golden") {
    val r = Seq(Tuple1("ab cde")).toDF("text")
      .select(TextOps.fingerprint(TextOps.tokens(col("text")))).as[Long].head()
    assert(r == 21807L) // matches DuckDB list_reduce oracle formula
  }

  test("bpeish pre-tokenizer golden: contractions, digit runs, punctuation runs") {
    val got = Seq(Tuple1("Don't count 123 tokens, ok?!")).toDF("text")
      .select(TextOps.bpeishTokens(col("text"))).as[Seq[String]].head()
    assert(got == Seq("Don", "'t", " count", " 123", " tokens", ",", " ok", "?!"))
    val empty = Seq(Tuple1("")).toDF("text")
      .select(TextOps.bpeishTokenCount(col("text"))).as[Int].head()
    assert(empty == 0)
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

  test("semDedup: identical vectors dedup to the lower id; dropped ids are true near-dups") {
    val corpus = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    // pick a vector with NO near-dup partner at tau, clone it under a
    // fresh high id: same cluster, cosine = 1, equal centroid sim
    val pairedIds = Knn.cosineNearDupPairs(corpus, tau = 0.30)
      .select("id1", "id2").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    val loner = corpus.select("id").as[Long].collect()
      .filterNot(pairedIds).min
    val clone = corpus.filter(col("id") === loner)
      .select((col("id") + 100000).as("id"), col("emb"))
    val kept = graft.sim.SemDedup.semDedup(corpus.unionByName(clone),
        c = 16, dim = 64, tau = 0.30, maxCluster = 100000)
      .select("id").as[Long].collect().toSet
    assert(kept.contains(loner) && !kept.contains(loner + 100000),
      "tie on centroid similarity must keep the lower id")
    // every dropped id really has a near-dup partner (precision exact)
    val all = corpus.select("id").as[Long].collect().toSet + (loner + 100000)
    val dropped = all -- kept
    assert(dropped.subsetOf(pairedIds + loner + (loner + 100000)),
      "semDedup dropped a row with no true near-dup partner")
  }

  test("semDedup: over-cap rows bypass dedup and are kept") {
    val corpus = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val keptTight = graft.sim.SemDedup.semDedup(corpus,
      c = 16, dim = 64, tau = 0.30, maxCluster = 4)
    val keptWide = graft.sim.SemDedup.semDedup(corpus,
      c = 16, dim = 64, tau = 0.30, maxCluster = 100000)
    // the cap only reduces how many rows are ELIGIBLE to be dropped
    assert(keptTight.count() >= keptWide.count())
    assert(keptTight.select("id").collect().length == keptTight.count().toInt)
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
