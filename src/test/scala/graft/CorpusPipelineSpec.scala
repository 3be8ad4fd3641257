package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.Corpus
import graft.extract.HtmlText

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("byte-identical text per url: xxhash64(extract(html)) == xxhash64(text) for ALL pages") {
    val pages = Corpus.pages(spark, TestSpark.sf0001)
    val mismatches = pages
      .withColumn("h_ref", xxhash64(col("text")))
      .withColumn("h_got", xxhash64(HtmlText.htmlText(col("html"))))
      .filter(col("h_ref") =!= col("h_got"))
      .count()
    assert(mismatches == 0)
  }

  test("pages are one-per-order with deterministic urls") {
    val pages = Corpus.pages(spark, TestSpark.sf0001)
    val orders = Corpus.table(spark, TestSpark.sf0001, "orders")
    assert(pages.count() == orders.count())
    assert(pages.select("url").distinct().count() == orders.count())
  }

  test("corpus derivation is deterministic across runs") {
    // bit_xor, not sum: ANSI mode (Spark 4 default) throws on long overflow.
    val h1 = Corpus.pages(spark, TestSpark.sf0001)
      .agg(bit_xor(xxhash64(col("url"), col("text")))).head().getLong(0)
    val h2 = Corpus.pages(spark, TestSpark.sf0001)
      .agg(bit_xor(xxhash64(col("url"), col("text")))).head().getLong(0)
    assert(h1 == h2)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("triples: P/R == 1.0 vs relationally-derived golden set at sf0.001") {
    // The golden triple set is derivable relationally (the corpus is a
    // deterministic function of the tables); extraction+linking must
    // reconstruct it exactly — this is the P/R>=0.95 gate at P=R=1.
    val got = SparkEntry.queries("q_triples")(spark, TestSpark.sf0001)
    val sfd = TestSpark.sf0001
    val part = Corpus.table(spark, sfd, "part")
    val orders = Corpus.table(spark, sfd, "orders")
    val li = Corpus.table(spark, sfd, "lineitem")
    val cust = Corpus.table(spark, sfd, "customer")
    import org.apache.spark.sql.expressions.Window
    val pc = part.select(col("p_partkey"),
      concat(lit("PART:"), regexp_replace(
        min(concat(lit("PARTRAW:"), col("p_partkey")))
          .over(Window.partitionBy("p_name")), "^PARTRAW:", "")).as("pid"))
    val ordered = orders.join(li, li("l_orderkey") === orders("o_orderkey"))
      .join(pc, pc("p_partkey") === li("l_partkey"))
      .select(concat(lit("CUST:"), col("o_custkey")).as("subject_id"),
        lit("ordered").as("relation_label"), col("pid").as("object_id"))
    val located = cust.join(orders, orders("o_custkey") === cust("c_custkey"))
      .select(concat(lit("CUST:"), col("c_custkey")).as("subject_id"),
        lit("located_in").as("relation_label"),
        concat(lit("NATION:"), col("c_nationkey")).as("object_id"))
    val golden = ordered.unionByName(located).distinct()
    assert(got.exceptAll(golden).count() == 0, "precision violation")
    assert(golden.exceptAll(got).count() == 0, "recall violation")
  }
}
