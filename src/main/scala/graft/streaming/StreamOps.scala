package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A (doc_id, text_hash) pair flowing through the streaming dedup. */
final case class HashedDoc(doc_id: Long, text_hash: Long)

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
