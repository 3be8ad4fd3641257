package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.PageRank
import graft.sim.{Ivf, Knn, Quant}

/** Vector quantization (SQ8 / PQ) and integer-PageRank salience. */
class QuantGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------ PageRank

  test("salience: hand-computed two rounds on a 3-node cycle-ish graph") {
    // 1→2, 3→2, 2→3; outdeg 1 everywhere; transfer = (s*85) div 100
    val e = Seq(("1", "2"), ("3", "2"), ("2", "3")).toDF("src", "dst")
    val r = PageRank.salience(e, iters = 2)
      .as[(String, Long)].collect().toMap
    // s1: 1→150000, 2→150000+850000·2=1850000, 3→150000+850000=1000000
    // s2: 2→150000+(150000·85 div 100)+(1000000·85 div 100)=1127500,
    //     3→150000+(1850000·85 div 100)=1722500
    assert(r == Map("1" -> 150000L, "2" -> 1127500L, "3" -> 1722500L))
  }

  test("salience: out-degree splits mass with floor division") {
    val e = Seq(("1", "2"), ("1", "3")).toDF("src", "dst")
    val r = PageRank.salience(e, iters = 1)
      .as[(String, Long)].collect().toMap
    // (1000000·85) div (100·2) = 425000
    assert(r == Map("1" -> 150000L, "2" -> 575000L, "3" -> 575000L))
  }

  test("salience: iters=0 is the uniform start; dangling node keeps base after a round") {
    val e = Seq(("1", "2")).toDF("src", "dst")
    val r0 = PageRank.salience(e, iters = 0).as[(String, Long)].collect().toMap
    assert(r0 == Map("1" -> 1000000L, "2" -> 1000000L))
    val r1 = PageRank.salience(e, iters = 1).as[(String, Long)].collect().toMap
    // node 2 is dangling (no out-edges): its mass retires, score still updates
    assert(r1 == Map("1" -> 150000L, "2" -> 1000000L))
  }

  // ----------------------------------------------------------------- SQ8

  test("sq8 codes: floor-based round-half-up, clamped to ±127") {
    val df = Seq((1L, Array(0.0f, 1.0f, -1.0f, 2.0f, -2.0f,
      0.5f / 127.0f, -0.5f / 127.0f, 0.004f))).toDF("id", "emb")
    val z = df.select(Quant.sq8Codes(col("emb"))).as[Seq[Byte]].head()
    // 0.5/127f·127 ≈ 0.5 (float repr slightly off-exact) → floor(x+0.5)
    val half = math.floor(0.5f / 127.0f * 127.0 + 0.5).toByte
    val negHalf = math.floor(-0.5f / 127.0f * 127.0 + 0.5).toByte
    assert(z.toSeq == Seq[Byte](0, 127, -127, 127, -127, half, negHalf, 1))
  }

  test("sq8 intDot is the exact integer dot") {
    val df = Seq((1L, Seq[Byte](1, -2, 3), Seq[Byte](4, 5, -6)))
      .toDF("id", "a", "b")
    assert(df.select(Quant.intDot(col("a"), col("b"))).as[Long].head() ==
      (4 - 10 - 18).toLong)
  }

  test("ivfTopKSq8: quantized ranking nearly matches exact IVF ranking") {
    val corpus = Corpus64.df(spark)
    val cents = Ivf.fixedCentroids(16, 64)
    val exact = Ivf.ivfTopK(corpus, dim = 64, k = 5, nprobe = 4,
      centroids = Some(cents))
      .as[(Long, Int, Long)].collect().groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._3).toSet }
    val sq8 = Quant.ivfTopKSq8(corpus, k = 5, nprobe = 4, maxList = 4096,
      centroids = cents)
      .as[(Long, Int, Long)].collect().groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._3).toSet }
    assert(sq8.keySet == exact.keySet)
    val overlap = exact.map { case (q, s) => (s & sq8(q)).size.toDouble / s.size }
    val mean = overlap.sum / overlap.size
    // int8 of [-1,1) floats loses <0.4% per coordinate — ranking barely moves
    assert(mean >= 0.9, s"sq8 vs exact-IVF top-5 overlap $mean < 0.9")
  }

  // ------------------------------------------------------------------ PQ

  test("pq codes: M entries, each a 1-based codeword in 1..Ks") {
    val corpus = Corpus64.df(spark).limit(50)
    val codes = corpus.select(Quant.pqCodes(col("emb"))).as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == Quant.PqM &&
      c.forall(j => j >= 1 && j <= Quant.PqKs)))
  }

  test("pq adc distance equals the hand fold over the reconstruction") {
    val emb = Array.tabulate(64)(d => ((d * 37 % 19) - 9) / 10.0f)
    val df = Seq((1L, emb)).toDF("id", "emb")
    val withCode = df.select(col("emb"), Quant.pqCodes(col("emb")).as("pc"))
    val (e, pc) = withCode.as[(Array[Float], Seq[Int])].head()
    val got = withCode.select(Quant.adcDist(col("emb"), col("pc")))
      .as[Double].head()
    var want = 0.0
    for (gd <- 0 until 64) {
      val cv = Quant.pqCbVal(gd, pc(gd / 8))
      val d = e(gd).toDouble - cv
      want += d * d
    }
    assert(got == want) // bit-identical: same fold order, same doubles
  }

  test("ivfTopKPq: rank column is dense 1..k per query and recall is sane") {
    val corpus = Corpus64.df(spark)
    val cents = Ivf.fixedCentroids(16, 64)
    val pq = Quant.ivfTopKPq(corpus, k = 5, nprobe = 4, maxList = 4096,
      centroids = cents)
      .as[(Long, Int, Long)].collect()
    val byQ = pq.groupBy(_._1)
    assert(byQ.values.forall(rs => rs.map(_._2).sorted.toSeq == (1 to rs.length)))
    // ADC over 16-codeword random-ish codebooks is coarse on uniform
    // vectors; gate a floor, not a ceiling: top-5 must beat random
    // candidate order by a wide margin (random ≈ 5/candidates ≈ 2%).
    val exact = Ivf.ivfTopK(corpus, dim = 64, k = 5, nprobe = 4,
      centroids = Some(cents))
      .as[(Long, Int, Long)].collect().groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._3).toSet }
    val overlap = byQ.collect { case (q, rs) if exact.contains(q) =>
      (exact(q) & rs.map(_._3).toSet).size.toDouble / 5.0 }
    val mean = overlap.sum / overlap.size
    assert(mean >= 0.10, s"pq vs exact-IVF top-5 overlap $mean < 0.10")
  }
}
