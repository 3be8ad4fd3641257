package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram LM quality scoring — the CCNet perplexity
  * filter (Wenzek et al. 2019) re-expressed with an INTEGER-exact
  * surprisal so the whole path is value-level oracle-checkable: the
  * float -log P(w2|w1) is quantized to whole bits as
  * floorlog2(count(w1·)) - floorlog2(count(w1 w2)), computed via
  * `length(bin(n)) - 1` — pure integer arithmetic any engine
  * reproduces, no libm in sight. High bits-per-bigram = the model is
  * surprised = low-quality/outlier text, exactly how the perplexity
  * filter is used.
  *
  * "Training" is one aggregation pass over the same corpus (bigram and
  * bigram-head counts); scoring joins each document's bigrams back to
  * the two count tables. Scale: both joins are equi-joins on token
  * keys (hashable to 8 bytes at scale), counts are map-side-combined,
  * and the final per-document reduce is a plain groupBy — no window,
  * no driver state.
  */
object LmScore {

  /** floor(log2(n)) for n >= 1: length of the binary rendering minus
    * one. Integer-exact — `bin` exists verbatim in DuckDB. */
  private def floorLog2(n: Column): Column = length(bin(n)) - 1

  /** (doc_id, n_bigrams, surprisal_bits, bits_per_bigram_milli) for
    * every document with at least 2 tokens (shorter docs have no
    * bigrams and are absent — callers treat them separately). */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("t"))
    val pairs = toks.select(col("doc_id"),
      explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    // head count (occurrences of w1 as a bigram head) rather than raw
    // unigram count: guarantees bc <= uc, so surprisal is >= 0 and
    // bc/uc IS the conditional MLE.
    val uni = pairs.groupBy("w1").agg(count(lit(1)).as("uc"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    pairs
      .join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(floorLog2(col("uc")) - floorLog2(col("bc"))).as("surprisal_bits"))
      .withColumn("bits_per_bigram_milli",
        floor(col("surprisal_bits") * 1000.0 / col("n_bigrams")).cast("long"))
  }
}
