package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHashExprs
import graft.textops.{DedupOps, TextOps}

/** The native text-hash kernels must be BIT-identical to the
  * composable higher-order-function forms they replace — the DuckDB
  * minhash/simhash oracles rebuild those exact integer sequences, so
  * any divergence would surface as a driver hash mismatch.
  */
class TextHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"${TestSpark.sf0001}/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("shingle codes: native kernel equals the HOF form on every fixture doc (order included)") {
    val bad = docs.select(
        TextHashExprs.shingleCodesCol(TextOps.tokens(col("text")), 3,
          1048573L, DedupOps.P).as("nat"),
        DedupOps.shingleCodesHof(col("text"), 3).as("hof"))
      .filter(not(col("nat") === col("hof")))
      .count()
    assert(bad === 0L)
  }

  test("minhash signatures: native kernel equals the k-fold array_min form") {
    val sets = DedupOps.shingleCodes(docs, "doc_id", "text", 3)
    val bad = sets.select(
        TextHashExprs.minhashSigCol(col("shc"), DedupOps.hashParams(64),
          DedupOps.P).as("nat"),
        DedupOps.minhashSigHof(col("shc"), 64).as("hof"))
      .filter(not(col("nat") === col("hof")))
      .count()
    assert(bad === 0L)
  }

  test("simhash: native kernel equals the per-bit aggregate form") {
    val bad = docs.select(
        DedupOps.simhashSignature(col("text")).as("nat"),
        DedupOps.simhashSigHof(col("text")).as("hof"))
      .filter(col("nat") =!= col("hof"))
      .count()
    assert(bad === 0L)
  }

  test("token codes: 400 random unicode strings (incl. supplementary plane) match the HOF form") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf(" ", "é", "中", "ß", "́"),
      Gen.oneOf("😀", "🜁", "😁")) // supplementary-plane
    val strGen = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val samples = (0 until 400).flatMap(i =>
      strGen(Gen.Parameters.default, Seed(i.toLong)))
    val bad = samples.toDF("t").select(
        graft.functions.TextHashExprs
          .tokenCodesCol(array(col("t")), 1048573L)(0).as("nat"),
        DedupOps.tokenCode(col("t"), 1048573L).as("hof"))
      .filter(col("nat") =!= col("hof"))
      .count()
    assert(bad === 0L)
  }

  test("token codes: empty, unicode and supplementary-plane tokens match the HOF form") {
    val weird = Seq("", "a", "hello", "héllo", "日本語", "a😀b", "x y")
      .toDF("t")
    val rows = weird.select(
        col("t"),
        TextHashExprs.tokenCodesCol(array(col("t")), 1048573L)(0).as("nat"),
        DedupOps.tokenCode(col("t"), 1048573L).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"token '${r.getString(0)}'")
    }
  }
}
