package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the training-data flagship that chains
  * every curation operator this library ships, in the order a public
  * LLM data pipeline runs them (C4/RefinedWeb/Gopher-style):
  *
  *   1. QUALITY GATE: language == lang, token count >= minTokens,
  *      stopword count >= minStopwords (map-only predicates);
  *   2. EXACT DEDUP: keep the min-doc_id representative per portable
  *      fingerprint (one window on an 8-byte key);
  *   3. NEAR-DUP CLUSTERING: MinHash-LSH pairs over the survivors →
  *      connected components → keep each cluster's minimum
  *      ([[DedupOps.dupClusters]] — chains collapse transitively);
  *   4. DECONTAMINATION: drop docs whose distinct-8-gram overlap with
  *      the benchmark corpus reaches tauMilli
  *      ([[DedupOps.decontaminate]] — benchmark side broadcasts);
  *   5. TOKEN-BUDGET MIX: per-source deterministic MINSTD-hash-order
  *      cut at budgetTokens ([[SampleOps.budgetSample]] — two-phase
  *      bucketed prefix sum).
  *
  * Every stage is deterministic and integer/string-exact, so the WHOLE
  * chain is reproduced by one composed DuckDB oracle (q_curated_corpus)
  * — the same stage SQL the per-operator oracles use, nested.
  *
  * Scale: stages 1-2 are one scan + one 8-byte-key window; stage 3
  * inherits the bounded LSH + CC posture; stage 4 is one broadcast
  * semi-aggregate; stage 5 never puts a whole source in one task. The
  * corpus is scanned once per hash family (fingerprint/minhash/
  * shingle) — at fact scale these fold into one docFacts-style shared
  * projection; here each stage consumes the previous stage's output,
  * which AQE keeps pipelined.
  */
object Curation {

  /** Curate `docs` (doc_id, text, source, lang) against `benchmark`
    * (doc_id, text). Returns kept rows:
    * (source, doc_id, n_tokens, cum_tokens) in sample order. */
  def curate(docs: DataFrame, benchmark: DataFrame,
             lang: String = "en", minTokens: Int = 30,
             minStopwords: Int = 2, tauMilli: Int = 200,
             budgetTokens: Long = 600L): DataFrame = {
    val toks: Column = TextOps.tokens(col("text"))
    // 1. quality gate
    val quality = docs.filter(
      col("lang") === lang &&
        TextOps.tokenCount(col("text")) >= minTokens &&
        TextOps.stopwordCount(toks, TextOps.langStopwords(lang)) >= minStopwords)
    // 2. exact dedup (min doc_id per fingerprint)
    val exact = quality
      .withColumn("fp", TextOps.fingerprint(toks))
      .withColumn("minid", min("doc_id").over(Window.partitionBy("fp")))
      .filter(col("doc_id") === col("minid"))
      .select("doc_id", "text", "source")
    // 3. near-dup clustering, keep cluster minima
    val canon = DedupOps
      .dupClusters(DedupOps.minhashNearDupPairs(exact, "doc_id", "text"),
        exact, "doc_id")
      .filter(col("is_canonical")).select("doc_id")
    val undup = exact.join(canon, Seq("doc_id"), "left_semi")
    // 4. decontamination (minTokens >= k guarantees every doc has rows)
    val clean = undup.join(
      DedupOps.decontaminate(undup, benchmark, "doc_id", "text",
        k = 8, tauMilli = tauMilli)
        .filter(!col("flagged")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    // 5. per-source token budget
    SampleOps.budgetSample(
      clean.select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", "source", budgetTokens)
  }
}
