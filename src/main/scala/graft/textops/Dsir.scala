package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance-weighted data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling")
  * made INTEGER-exact so every value is oracle-checkable: the paper's
  * hashed n-gram bag-of-words generative model scores each raw
  * document by log p_target(doc) - log p_raw(doc); here both
  * distributions are hashed-unigram count models and every log2 is
  * quantized to whole bits via floorlog2 (`length(bin(n)) - 1`, the
  * LmScore discipline — no libm, bit-identical in any engine).
  *
  * Per feature bucket f (token char-fold code mod `dim`, the
  * fastText/TextOps.qualityScoreMilli hashing trick):
  *   w(f) = floorlog2(tgt(f) + 1) - floorlog2(raw(f) + 1)
  * (+1 = add-one smoothing; raw counts the WHOLE pool, target
  * included, matching the paper's raw-pool definition). Per document:
  * logw_bits = sum over token occurrences of w(bucket(token)), and the
  * length-normalized logw_milli = floor(1000 * logw_bits / n_tokens)
  * is what the keep threshold gates — the paper selects top-k by
  * importance weight; a fixed per-token bit-rate threshold is the
  * deterministic, driver-checkable equivalent.
  *
  * Scale shape (the 100 TB plan):
  *  - feature counting is ONE scan of the pool with a conditional
  *    aggregate (target membership is a flag column, never a second
  *    scan or a join) shuffling at most `dim` 8-byte keys, map-side
  *    combined;
  *  - the weight table is `dim` rows — broadcast by construction;
  *  - per-document scoring shuffles (doc_id, f) pairs once and reduces
  *    by doc_id — no window, no driver state, no vocabulary lookup.
  */
object Dsir {

  /** floor(log2(n)) for n >= 1 — integer-exact, DuckDB-portable. */
  private def floorLog2(n: Column): Column = length(bin(n)) - 1

  /** (doc_id, n_feat, logw_bits, logw_milli, keep) for every document
    * with at least one token. `isTarget` is a predicate column over
    * `docs` marking the target-distribution members (e.g. a curated
    * high-quality slice); `tauMilli` is the keep threshold on the
    * per-token importance bit-rate. */
  def importanceSelect(docs: DataFrame, isTarget: Column, idCol: String,
      textCol: String, dim: Int = 256, tauMilli: Long = -5000L): DataFrame = {
    // ONE tokenize+hash pass over the pool: reduce straight to the
    // (doc, f) grain, materialize, and derive the weight table from
    // that far smaller frame — the pool text is never scanned twice
    val per = docs.select(col(idCol).as("doc_id"), isTarget.as("is_tgt"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), col("is_tgt"),
        pmod(DedupOps.tokenCode(col("tok"), DedupOps.CHAR_M),
          lit(dim.toLong)).as("f"))
      .groupBy("doc_id", "is_tgt", "f").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val weights = per.groupBy("f")
      .agg(sum(col("n")).as("rc"),
        sum(when(col("is_tgt"), col("n")).otherwise(0L)).as("tc"))
      .select(col("f"),
        (floorLog2(col("tc") + 1) - floorLog2(col("rc") + 1)).as("w_bits"))
    per.join(broadcast(weights), Seq("f"))
      .groupBy("doc_id")
      .agg(sum(col("n")).cast("long").as("n_feat"),
        sum(col("n") * col("w_bits")).cast("long").as("logw_bits"))
      .withColumn("logw_milli",
        floor(col("logw_bits") * 1000.0 / col("n_feat")).cast("long"))
      .withColumn("keep", col("logw_milli") >= tauMilli)
  }
}
