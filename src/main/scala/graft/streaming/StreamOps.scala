package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A (doc_id, text_hash) pair flowing through the streaming dedup. */
final case class HashedDoc(doc_id: Long, text_hash: Long)

/** A document's banded LSH row: one per (band, bucket) of its MinHash
  * signature, carrying the shingle-code set for exact verification. */
final case class BandDoc(band: Int, bucket: String, doc_id: Long,
                         shc: Array[Long])

/** Bounded per-bucket LSH state: the docs (ids + shingle-code sets)
  * kept in one (band, bucket) cell across micro-batches. */
final case class BucketDocs(ids: Array[Long], shcs: Array[Array[Long]])

/** A verified near-duplicate pair (same shape as the batch
  * DedupOps.minhashNearDupPairs output). */
final case class DupPair(id1: Long, id2: Long, common: Int,
                         size1: Int, size2: Int)

/** A raw page flowing into the streaming KG front-end. */
final case class RawPage(url: String, html: Array[Byte])

/** Streaming-shaped transforms. The reference is pure batch (SURVEY.md
  * §2.11) so streaming here is additive surface: the same windowed
  * aggregation works over a batch DataFrame and a readStream source —
  * asserted equivalent in ScalaTest via a memory-sink run.
  */
object StreamOps {

  /** Hourly tumbling-window aggregate per event type — usable both in
    * batch (q_events_hourly) and as a Structured Streaming query (with
    * a watermark added by the caller for append mode).
    *
    * The value sum is emitted as BIGINT micro-units: a decimal SUM's
    * result precision is engine-specific (Spark decimal(28,6) vs DuckDB
    * decimal(38,6) — physical-type hash mismatch even when every value
    * is identical), while floor-to-micros is one exact integer per row
    * in both engines. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000000L).cast("long")).as("sum_value_micros"),
        min(col("user_id")).as("min_user"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"), col("sum_value_micros"), col("min_user"))

  /** Watermarked variant for append-mode streaming sinks. */
  def hourlyAggStreaming(events: DataFrame): DataFrame =
    hourlyAgg(events.withWatermark("ts", "2 hours"))

  /** The flagship pipeline's front half (stage 1 extract + stage 2
    * broadcast-trie mention linking) applied to a STREAMING page
    * source: both stages are map-only over the fact side (a UDF
    * projection and a `mapPartitions` scan against the broadcast
    * dictionary trie), so the identical code path runs batch or
    * streaming — micro-batched continuous KG construction over an
    * arriving crawl, no shuffle before the sink. Equivalence to the
    * batch path is spec-asserted (StoreStreamSpec). */
  def mentionsStream(pages: DataFrame, dict: DataFrame): DataFrame = {
    val text = pages.select(col("url"),
      graft.extract.HtmlText.htmlText(col("html")).as("text"))
    graft.link.Linker.mentions(text, dict)
  }

  /** Continuous KG construction INTO the snapshot store: the streaming
    * front half ([[mentionsStream]]) sunk via foreachBatch, each
    * micro-batch committing ONE idempotent store snapshot whose id is
    * the batchId (GraphStore.commitBatch — a failure-replayed batch
    * skips its committed manifest or re-writes its corpse, the same
    * commit-is-the-manifest guarantee as the batch pipeline). The
    * stage's table is the union of batch snapshots
    * (GraphStore.readAllSnapshots); the batch back half (entity sets →
    * triples/evidence) runs over that union unchanged — streamed store
    * ≡ batch store, spec-asserted in StoreStreamSpec. The caller
    * `.start()`s the returned writer (and picks a trigger). */
  def mentionsIntoStore(pages: DataFrame, dict: DataFrame, storeBase: String,
                        stage: String = "mentions_stream")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    mentionsStream(pages, dict).writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.store.GraphStore.commitBatch(
          batch.sparkSession, storeBase, stage, batchId, batch,
          inputFp = s"stream;stage=$stage;batch=$batchId")
        ()
      }

  /** FULL continuous KG construction: each micro-batch runs extract →
    * trie linking → per-page entity sets → canonicalized triple
    * extraction, and commits BOTH its mentions and its triple
    * contributions as idempotent batch snapshots (two stages, one
    * batchId — replay-safe per stage). The canonicalization table is a
    * slowly-changing dimension, computed once by the caller. The
    * streamed triple table is APPEND-ONLY; the exact triple set is the
    * union of snapshots with a read-side distinct (the same triple can
    * arrive from pages in different batches), asserted equal to the
    * batch path in StoreStreamSpec. */
  def triplesIntoStore(pages: DataFrame, dict: DataFrame, canon: DataFrame,
                       storeBase: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    pages.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val mentions = mentionsStream(batch, dict)
        graft.store.GraphStore.commitBatch(
          spark, storeBase, "mentions_stream", batchId, mentions,
          inputFp = s"stream;stage=mentions;batch=$batchId")
        val triples = graft.triples.Triples.extract(mentions, canon)
        graft.store.GraphStore.commitBatch(
          spark, storeBase, "triples_stream", batchId, triples,
          inputFp = s"stream;stage=triples;batch=$batchId")
        ()
      }

  /** Streaming NEAR-duplicate detection over a continuously-arriving
    * corpus: the streaming counterpart of
    * [[graft.textops.DedupOps.minhashNearDupPairs]], same signatures
    * (native MinHash kernels — per-row expressions, so they run
    * unchanged on a streaming Dataset), same (k, r) banding, same
    * EXACT shingle-set verification with the identical
    * `common * (1+tau) >= tau * (size1+size2)` arithmetic.
    *
    * State (flatMapGroupsWithState keyed by (band, bucket)): up to
    * `maxBucket` (doc_id, shingle-code-set) members per LSH cell —
    * bounded regardless of stream length, the streaming analogue of
    * the batch per-bucket cap. A doc arriving at a full cell is
    * verified against the kept members but not added (documented
    * recall loss at the cap, exactly like the batch cap's dropped
    * hot-bucket tail). A pair sharing multiple bands/batches is
    * emitted once per sharing cell — the exact pair set is the
    * read-side `distinct`, the same append-only contract as the
    * streamed triple table. Spec: streamed distinct pairs == batch
    * pairs on a corpus split ACROSS micro-batches
    * (StoreStreamSpec). */
  def nearDupStream(docs: Dataset[(Long, String)], n: Int = 3, k: Int = 64,
                    r: Int = 2, tau: Double = 0.5,
                    maxBucket: Int = 64): Dataset[DupPair] = {
    import docs.sparkSession.implicits._
    val sig = graft.textops.DedupOps.minhashSignatures(
      docs.toDF("doc_id", "text"), "doc_id", "text", n, k)
    val nBands = k / r
    val bands = sig.select(
        posexplode(array((0 until nBands).map { b =>
          concat_ws(",", (0 until r).map(j =>
            element_at(col("sig"), b * r + j + 1).cast("string")): _*)
        }: _*)).as(Seq("band", "bucket")),
        col("doc_id"), col("shc"))
      .select(col("band"), col("bucket"), col("doc_id"), col("shc"))
      .as[BandDoc]
    bands.groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketDocs, DupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, String), rows: Iterator[BandDoc], state: GroupState[BucketDocs]) =>
          val kept = state.getOption.getOrElse(
            BucketDocs(Array.empty, Array.empty))
          var ids = kept.ids
          var shcs = kept.shcs
          val out = scala.collection.mutable.ArrayBuffer.empty[DupPair]
          // deterministic intra-batch order; replayed/duplicate doc ids
          // are no-ops against the kept membership
          rows.toArray.sortBy(_.doc_id).foreach { d =>
            if (!ids.contains(d.doc_id)) {
              val set2 = d.shc.toSet
              var i = 0
              while (i < ids.length) {
                val common = shcs(i).count(set2.contains)
                val s1 = shcs(i).length
                val s2 = d.shc.length
                if (common * (1.0 + tau) >= tau * (s1 + s2)) {
                  out += (if (ids(i) < d.doc_id)
                    DupPair(ids(i), d.doc_id, common, s1, s2)
                  else DupPair(d.doc_id, ids(i), common, s2, s1))
                }
                i += 1
              }
              if (ids.length < maxBucket) {
                ids = ids :+ d.doc_id
                shcs = shcs :+ d.shc
              }
            }
          }
          state.update(BucketDocs(ids, shcs))
          out.iterator
      }
  }

  /** Streaming exact-dedup with CUSTOM STATE (flatMapGroupsWithState —
    * SURVEY §2.11's KeyValueGroupedDataset surface): the first document
    * ever seen for each text hash is emitted; every later duplicate —
    * in the same micro-batch (min doc_id wins, deterministic) or any
    * later one (state) — is dropped. This is the streaming counterpart
    * of DedupOps.exactDedup for continuously-arriving corpora.
    *
    * Scale: state is one boolean per distinct hash, partitioned by the
    * groupByKey shuffle — the state store grows with distinct content,
    * not with stream length. */
  def dedupStream(docs: Dataset[HashedDoc]): Dataset[HashedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.text_hash)
      .flatMapGroupsWithState[Boolean, HashedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[HashedDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(_.doc_id))
          }
      }
  }
}
