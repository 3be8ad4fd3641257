package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed graph tables — the in-sandbox analogue of the north-star's
  * Iceberg layout ("nodes table bucketed by canonical_id, edges table
  * bucketed by subject_id").
  *
  * `bucketBy(n, key)` + `sortBy(key)` hash-partitions each table into n
  * bucket files by key at WRITE time and records the layout in the
  * catalog. Every subsequent join or aggregation on the bucket key
  * then reads co-located buckets directly: the physical plan contains
  * NO Exchange on either side (spec-asserted in BucketedStoreSpec) —
  * at 100 TB that is the difference between re-shuffling the full edge
  * set on every traversal query and a pure scan-side merge join. The
  * bucket count is a write-time knob: size it so one bucket ≈ one task
  * (e.g. 2^13 buckets for 10^12 edges keeps buckets in the 10^8-row
  * range, AQE-coalescible on small reads).
  *
  * Reference: the BioCypher CSV batch sink (the reference's terminal
  * write, batch_writer paths in SURVEY §2 S10) has no co-location
  * story at all — every downstream Neo4j import re-sorts the world.
  */
object BucketedGraph {

  /** Write nodes (bucketed by `id`) and edges (bucketed by
    * `subject_id`), both sort-ordered within buckets, as catalog
    * tables `<prefix>_nodes` / `<prefix>_edges`. */
  def write(nodes: DataFrame, edges: DataFrame,
            prefix: String, nBuckets: Int): Unit = {
    nodes.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "id").sortBy("id")
      .format("parquet").saveAsTable(s"${prefix}_nodes")
    edges.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "subject_id").sortBy("subject_id")
      .format("parquet").saveAsTable(s"${prefix}_edges")
  }

  /** Edges resolved to their subject node rows via the co-located
    * bucket join (subject_id == node id; no Exchange on either side —
    * both scans are pre-bucketed on the join key). */
  def edgesWithSubjects(spark: SparkSession, prefix: String): DataFrame = {
    val nodes = spark.table(s"${prefix}_nodes")
    val edges = spark.table(s"${prefix}_edges")
    edges.join(nodes, edges("subject_id") === nodes("id"))
  }

  /** Per-subject edge counts over the bucketed edge table — grouping on
    * the bucket key needs no shuffle either (partial = final). */
  def subjectDegrees(spark: SparkSession, prefix: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.table(s"${prefix}_edges")
      .groupBy("subject_id").agg(count(lit(1)).as("degree"))
  }

  /** Write the REVERSE adjacency: the same edge rows bucketed by
    * `object_id` as `<prefix>_edges_rev`. Forward (by subject) +
    * reverse (by object) is the classic distributed graph-store
    * layout: a k-hop traversal alternates the two tables and every
    * hop's equi-join lands bucket-on-bucket — at 10^12 edges the
    * duplicate storage buys shuffle-free traversal, the same trade
    * every production adjacency store makes. */
  def writeReverse(edges: DataFrame, prefix: String, nBuckets: Int): Unit =
    edges.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "object_id").sortBy("object_id")
      .format("parquet").saveAsTable(s"${prefix}_edges_rev")

  /** 2-hop traversal (a)-[e1]->(b)-[e2]->(c): hop 1 reads the REVERSE
    * table (bucketed by object_id = the join key), hop 2 the FORWARD
    * table (bucketed by subject_id) — the join is bucket-on-bucket, so
    * the plan contains NO Exchange on either scan
    * (ScaleTechniquesSpec asserts this). Self-pairs (a == c via a
    * reciprocal edge) are kept — semantics, not plumbing, decides
    * those downstream. */
  def twoHop(spark: SparkSession, prefix: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val rev = spark.table(s"${prefix}_edges_rev")
      .select(col("subject_id").as("a"), col("relation_label").as("rel1"),
        col("object_id"))
    val fwd = spark.table(s"${prefix}_edges")
      .select(col("subject_id"), col("relation_label").as("rel2"),
        col("object_id").as("c"))
    rev.join(fwd, rev("object_id") === fwd("subject_id"))
      .select(col("a"), col("rel1"), col("object_id").as("b"),
        col("rel2"), col("c"))
  }
}
