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

/** One event of the COMBINED streaming-KG input: kind="page" carries
  * (url, html); kind="alias" carries a same-entity edge (src, dst) —
  * the CDC-shaped union a continuously-constructed KG actually
  * receives (crawled documents interleaved with identity assertions). */
final case class KgEvent(kind: String, url: String, html: Array[Byte],
                         src: String, dst: String)

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

  /** Gap-based SESSIONIZATION per user (`session_window` — the
    * training-data pipeline's user-session unit): events merge into one
    * session while the gap to the previous event is STRICTLY below
    * `gap`; emits the session start, event count and exact integer
    * value sum (per-row integerization BEFORE the sum, the
    * summation-order-independence discipline). The same code path runs
    * batch (q_user_sessions, DuckDB gaps-and-islands oracle) and
    * streaming ([[userSessionsStreaming]], memory-sink equivalence
    * spec). Scale: one shuffle on user_id; state per user is the open
    * session only (the built-in session operator evicts closed sessions
    * at the watermark). */
  def userSessions(events: DataFrame, gap: String = "12 hours"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000 + 0.5).cast("long")).as("value_milli"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"), col("value_milli"))

  /** Watermarked variant for append-mode streaming sinks. */
  def userSessionsStreaming(events: DataFrame, gap: String = "12 hours"): DataFrame =
    userSessions(events.withWatermark("ts", "10 days"), gap)

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

  /** INCREMENTAL CANONICALIZATION: continuous KG construction where the
    * canon table is itself stream-maintained — a late-arriving alias
    * that merges two CC clusters triggers a correction pass, so the
    * streamed store CONVERGES to the batch store instead of freezing
    * early triples under a stale canonicalization.
    *
    * Per micro-batch (all commits idempotent, batchId-keyed):
    *  1. the batch's alias edges are committed (`alias_stream`) and the
    *     canon recomputed over the ACCUMULATED alias set via `canonOf`
    *     (monotone merge: canonical = min member id, so a merge only
    *     ever lowers a cluster's canonical — no oscillation);
    *  2. the new canon is snapshot (`canon_stream`) and diffed against
    *     the previous snapshot: the distinct (old_id → new_id) pairs of
    *     entities whose canonical CHANGED are the batch's rewrite map
    *     (`canon_rewrites`). Within one batch the map is conflict-free:
    *     an id cannot be both a rewrite source and target (a target is
    *     a current cluster minimum; a source just stopped being one);
    *  3. previously-committed triples (including earlier corrections)
    *     touching a rewritten id are re-emitted re-canonicalized as a
    *     CORRECTION snapshot (`triples_corrections`) — a broadcast
    *     semi-join against the (dimension-sized) rewrite map, so the
    *     fact log is scanned but never shuffled; at warehouse scale the
    *     store's entity-bucketed layout turns this into a pruned read;
    *  4. the batch's own pages flow through extract → link → triples
    *     under the CURRENT canon (`mentions_stream`/`triples_stream`).
    *
    * The exact triple set is [[resolvedStreamTriples]]: union of
    * triple + correction snapshots with every endpoint resolved through
    * the transitive closure of the rewrite log, then distinct — stale
    * rows collapse onto their corrected twins. Scale: `canonOf` runs
    * over the alias DIMENSION (entity-churn-proportional, never
    * corpus-proportional); the fact side is only re-read for targeted
    * corrections. Spec (StoreStreamSpec): a cluster-merging alias
    * arriving in batch 2 — streamed final store ≡ batch store. */
  def kgIncrementalIntoStore(
      events: DataFrame, dict: DataFrame,
      canonOf: DataFrame => DataFrame, storeBase: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.store.GraphStore
        val spark = batch.sparkSession
        import spark.implicits._
        val fp = s"stream;kg_incremental;batch=$batchId"
        val pages = batch.filter(col("kind") === "page").select("url", "html")
        val aliases = batch.filter(col("kind") === "alias").select("src", "dst")
        val hasAliases = !aliases.isEmpty // one job, reused thrice below
        if (hasAliases)
          GraphStore.commitBatch(spark, storeBase, "alias_stream", batchId,
            aliases, inputFp = fp)
        val prevId = GraphStore.snapshots(storeBase, "canon_stream")
          .filter(_ < batchId).lastOption
        // canon is a dimension: materialize once per batch, reuse for
        // diff, corrections, and this batch's triple extraction. An
        // ALIAS-FREE batch cannot change it — reuse the previous
        // snapshot and skip the CC recompute, the snapshot write, and
        // the provably-empty diff (a page-heavy stream pays canon work
        // only on entity churn, keeping the path churn-proportional).
        val canon =
          if (!hasAliases && prevId.nonEmpty)
            GraphStore.readSnapshot(spark, storeBase, "canon_stream",
              prevId.get).get
          else {
            val allAliases = GraphStore
              .readAllSnapshots(spark, storeBase, "alias_stream")
              .getOrElse(Seq.empty[(String, String)].toDF("src", "dst"))
            val c = canonOf(allAliases).localCheckpoint(true)
            GraphStore.commitBatch(spark, storeBase, "canon_stream", batchId,
              c, inputFp = fp)
            c
          }
        val rewrites = prevId.filter(_ => hasAliases).map { p =>
          val prev = GraphStore.readSnapshot(spark, storeBase, "canon_stream", p).get
          graft.canon.Canonicalize.rank1(canon)
            .withColumnRenamed("canonical_id", "new_id")
            .join(graft.canon.Canonicalize.rank1(prev)
              .withColumnRenamed("canonical_id", "old_id"), "raw_id")
            .filter(col("old_id") =!= col("new_id"))
            .select("old_id", "new_id").distinct()
            .localCheckpoint(true)
        }.filter(!_.isEmpty)
        rewrites.foreach { rw =>
          GraphStore.commitBatch(spark, storeBase, "canon_rewrites", batchId,
            rw, inputFp = fp)
          // corrections BEFORE this batch's own triples land (replay-
          // safe either way: already-current rows miss the old-id join)
          GraphStore.readAllSnapshots(spark, storeBase, "triples_stream")
            .foreach { committed =>
              val prior = GraphStore
                .readAllSnapshots(spark, storeBase, "triples_corrections")
                .map(committed.unionByName(_)).getOrElse(committed)
              val m = broadcast(rw)
              // checkpoint BEFORE the isEmpty probe (same pattern as
              // `rewrites` above): the probe and the commit would
              // otherwise each re-scan the full prior triple log —
              // the most expensive step of the correction path, twice
              val corrected = prior
                .join(m.select(col("old_id").as("subject_id"),
                  col("new_id").as("s2")), Seq("subject_id"), "left")
                .join(m.select(col("old_id").as("object_id"),
                  col("new_id").as("o2")), Seq("object_id"), "left")
                .filter(col("s2").isNotNull || col("o2").isNotNull)
                .select(
                  coalesce(col("s2"), col("subject_id")).as("subject_id"),
                  col("relation_label"),
                  coalesce(col("o2"), col("object_id")).as("object_id"))
                .distinct()
                .localCheckpoint(true)
              if (!corrected.isEmpty)
                GraphStore.commitBatch(spark, storeBase, "triples_corrections",
                  batchId, corrected, inputFp = fp)
            }
        }
        if (!pages.isEmpty) {
          val mentions = mentionsStream(pages, dict)
          GraphStore.commitBatch(spark, storeBase, "mentions_stream", batchId,
            mentions, inputFp = fp)
          val triples = graft.triples.Triples.extract(mentions, canon)
          GraphStore.commitBatch(spark, storeBase, "triples_stream", batchId,
            triples, inputFp = fp)
        }
        ()
      }

  /** The exact triple set of a [[kgIncrementalIntoStore]] store: union
    * the triple and correction snapshots, resolve every endpoint
    * through the transitive closure of the rewrite log (closure = the
    * existing distributed CC over rewrite edges — component minimum IS
    * the final target, because rewrites are monotone decreasing), then
    * distinct. Superseded rows map onto their corrected twins and
    * collapse; the rewrite dimension is broadcast, so the fact union is
    * one scan + map-side join + one distinct shuffle. */
  def resolvedStreamTriples(spark: org.apache.spark.sql.SparkSession,
                            storeBase: String): DataFrame = {
    import graft.store.GraphStore
    import spark.implicits._
    val t = GraphStore.readAllSnapshots(spark, storeBase, "triples_stream")
      .getOrElse(Seq.empty[(String, String, String)]
        .toDF("subject_id", "relation_label", "object_id"))
    val all = GraphStore.readAllSnapshots(spark, storeBase, "triples_corrections")
      .map(t.unionByName(_)).getOrElse(t)
    GraphStore.readAllSnapshots(spark, storeBase, "canon_rewrites") match {
      case None => all.distinct()
      case Some(rw) =>
        val closed = graft.cc.ConnectedComponents.run(spark,
            rw.select(col("old_id").as("src"), col("new_id").as("dst")))
          .select(col("member").as("old_id"), col("component").as("final_id"))
        val m = broadcast(closed)
        all
          .join(m.select(col("old_id").as("subject_id"),
            col("final_id").as("s2")), Seq("subject_id"), "left")
          .join(m.select(col("old_id").as("object_id"),
            col("final_id").as("o2")), Seq("object_id"), "left")
          .select(
            coalesce(col("s2"), col("subject_id")).as("subject_id"),
            col("relation_label"),
            coalesce(col("o2"), col("object_id")).as("object_id"))
          .distinct()
    }
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
