package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling operators for LLM training-data mixing — the stage
  * after filtering/dedup where the curated pool is cut down to a token
  * budget per source (mixture weights) or thinned at per-stratum rates.
  * Both samplers are DETERMINISTIC (a portable MINSTD hash of the doc
  * id orders/thins the corpus), so a re-run — or the DuckDB oracle —
  * reproduces the exact sample.
  */
object SampleOps {

  /** 2^31 - 1 — the MINSTD modulus; also the code space of the dedup
    * family's portable hashes. */
  val P: Long = 2147483647L

  /** Portable deterministic per-doc sampling key: MINSTD step on the
    * id, `((id mod P) * 48271) mod P`. Max intermediate is
    * (P-1)*48271 < 2^63 — ANSI-safe at any id, and the same arithmetic
    * runs verbatim in the oracle engine. */
  def sampleKey(id: Column): Column = pmod(pmod(id, lit(P)) * 48271L, lit(P))

  /** Token-budget mixture sampling: per source, keep documents in
    * deterministic hash order while the running token total stays
    * within `budgetTokens` (the "sample s.t. source i contributes B_i
    * tokens" step of public LLM data-mixing recipes; the first doc that
    * crosses the budget and everything after it are dropped).
    *
    * Output: (source, doc_id, n_tokens, cum_tokens) for kept docs,
    * where cum_tokens is the inclusive running total in sample order.
    *
    * Scale: a naive `Window.partitionBy(source)` puts an entire source
    * — terabytes at corpus scale, since sources number in the tens —
    * into ONE task. Instead the prefix sum is TWO-PHASE over `buckets`
    * contiguous RANGES of the sample key (range, not hash: bucket
    * order must equal key order for offsets to compose):
    *   1. per-(source, bucket) token sums — a tiny aggregate
    *      (sources × buckets rows), windowed into exclusive bucket
    *      offsets on the driver-sized frame;
    *   2. offsets broadcast back; the within-bucket running sum is a
    *      window over ONE bucket of ONE source — corpus/buckets rows,
    *      the knob that bounds task state at any scale.
    */
  def budgetSample(docs: DataFrame, idCol: String, tokensCol: String,
                   srcCol: String, budgetTokens: Long,
                   buckets: Int = 64): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0: $budgetTokens")
    require(buckets >= 1, s"bucket count must be >= 1: $buckets")
    val span = (P + buckets - 1) / buckets // ceil: key/span < buckets
    val keyed = docs.select(
      col(srcCol).as("source"), col(idCol).as("doc_id"),
      col(tokensCol).cast("long").as("n_tokens"),
      sampleKey(col(idCol)).as("h"))
      .withColumn("bucket", (col("h") / span).cast("int"))
    // Phase 1: sources × buckets rows — dimension-sized by construction.
    val offsets = keyed.groupBy("source", "bucket")
      .agg(sum("n_tokens").as("bucket_tokens"))
      .withColumn("offset",
        coalesce(
          sum("bucket_tokens").over(
            Window.partitionBy("source").orderBy("bucket")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("source", "bucket", "offset")
    keyed.join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("cum_tokens",
        col("offset") + sum("n_tokens").over(
          Window.partitionBy("source", "bucket").orderBy("h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") <= budgetTokens)
      .select("source", "doc_id", "n_tokens", "cum_tokens")
  }

  /** Per-stratum rate sampling: keep a document iff
    * `sampleKey(id) mod 1000 < rateMilli(stratum)` — the map-only,
    * shuffle-free thinning every mixture pipeline applies when a
    * source is over-represented. `rateMilli` is any integer Column in
    * [0, 1000] (typically a CASE over the stratum column, or a
    * broadcast-joined rate table). Deterministic: the same doc is kept
    * on every run and in the oracle engine. */
  def stratifiedSample(docs: DataFrame, idCol: String,
                       rateMilli: Column): DataFrame =
    docs.filter(pmod(sampleKey(col(idCol)), lit(1000L)) < rateMilli)

  /** Sequence packing — the concat-and-chop layout every LLM training
    * run performs: documents are laid end to end in doc-id order and
    * cut into fixed `seqLen`-token training sequences; a document that
    * straddles a cut contributes one segment row per sequence it
    * touches. Output: (seq_id, doc_id, doc_off, seq_off, len) — the
    * complete integer address book a data loader needs to materialize
    * any sequence without re-tokenizing.
    *
    * Scale: the global token prefix sum is the [[budgetSample]]
    * two-phase discipline over contiguous doc-id RANGES (never one
    * unpartitioned window): per-bucket sums make a dimension-sized
    * offsets frame, broadcast back, and the within-bucket running sum
    * windows over corpus/buckets rows. The straddle fan-out is bounded
    * by n_tokens/seqLen + 1 per document. Deterministic and
    * integer-only end to end. */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
                    seqLen: Int, buckets: Int = 64): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1: $seqLen")
    require(buckets >= 1, s"bucket count must be >= 1: $buckets")
    val d = docs.select(col(idCol).cast("long").as("doc_id"),
        col(tokensCol).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val maxId = d.agg(max("doc_id")).head.getLong(0)
    val span = (maxId + buckets) / buckets // ceil((maxId+1)/buckets)
    val keyed = d.withColumn("bucket", (col("doc_id") / span).cast("int"))
    // Phase 1: `buckets` rows — dimension-sized by construction.
    val offsets = keyed.groupBy("bucket")
      .agg(sum("n_tokens").as("bucket_tokens"))
      .withColumn("offset",
        coalesce(
          sum("bucket_tokens").over(
            Window.orderBy("bucket")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("bucket", "offset")
    val spans = keyed.join(broadcast(offsets), "bucket")
      .withColumn("end_tok",
        col("offset") + sum("n_tokens").over(
          Window.partitionBy("bucket").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
    val L = lit(seqLen.toLong)
    spans
      .select(col("doc_id"), col("start_tok"), col("end_tok"),
        explode(sequence(
          floor(col("start_tok") / L),
          floor((col("end_tok") - 1) / L))).as("seq_id"))
      .select(
        col("seq_id"),
        col("doc_id"),
        (greatest(col("start_tok"), col("seq_id") * L) - col("start_tok")).as("doc_off"),
        (greatest(col("start_tok"), col("seq_id") * L) - col("seq_id") * L).as("seq_off"),
        (least(col("end_tok"), (col("seq_id") + 1) * L)
          - greatest(col("start_tok"), col("seq_id") * L)).as("len"))
  }
}
