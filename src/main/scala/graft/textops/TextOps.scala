package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token stats, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure Column expressions (whole-stage codegen;
  * the scan stays columnar and the ops pipeline without shuffles).
  */
object TextOps {

  /** Let-binding for column expressions: evaluates `e` ONCE and passes
    * it to `f` as a lambda variable. Catalyst's CollapseProject inlines
    * projected expressions into every usage site — for an expression
    * used k times inside array lambdas that means k full recomputations
    * per row (observed: shingling re-tokenized the whole document per
    * n-gram). Lambda variables are opaque to that rule, so
    * transform-over-singleton is an optimizer barrier with zero shuffle
    * cost. */
  def let(e: Column, f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Word n-gram shingles (for Jaccard/MinHash dedup). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, (i + j + 1).cast("int"))): _*)))
      .otherwise(array())

  /** Count of tokens contained in a fixed stopword list. */
  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedlit(stopwords), t)))

  /** BPE-ish pre-tokenizer pattern (the GPT-2-style pre-split:
    * contraction suffixes, optionally-space-prefixed letter runs,
    * digit runs, punctuation runs, residual whitespace). Deliberately
    * engine-identical so the SAME pattern runs in DuckDB for the
    * oracle: no lookahead (RE2 has none), leftmost-first alternation
    * in both, and the whitespace class is spelled out explicitly —
    * Java's \s includes U+000B where RE2's does not, so \s would
    * diverge on vertical tabs. (Residual caveat, documented: \p{L} /
    * \p{N} follow each engine's Unicode table version.) The merge
    * table of a real BPE is a model artifact; counting PRE-tokens
    * approximates LLM token counts far better than whitespace
    * counting on punctuation-dense text. */
  private val Ws = " \\t\\n\\f\\r" // the 5 chars Java and RE2 agree on
  val BpeishPattern: String =
    s"'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^$Ws\\p{L}\\p{N}]+|[$Ws]+"

  /** BPE-ish pre-token pieces, e.g. "Don't count 123!" ->
    * ["Don", "'t", " count", " 123", "!"]. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  /** LLM-style token count: number of BPE-ish pre-token pieces. */
  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** REAL LLM token count: the learned BPE merge table
    * ([[Bpe.merges]]) applied to every pre-token piece — the full
    * pre-tokenize → merge-table-encode path of a production tokenizer,
    * counted per document. */
  def bpeTokenCount(text: Column): Column =
    graft.functions.BpeExprs.bpeTokenCountCol(bpeishTokens(text))

  /** Mean token length ×1000, as integer (cross-engine exact). */
  def meanTokenLenMilli(toks: Column): Column =
    floor(aggregate(toks, lit(0L), (acc, t) => acc + length(t)) * 1000
      / size(toks)).cast("long")

  /** Quality components: (n_tokens, n_distinct, n_stop, stop_ratio).
    * The ratio is one IEEE division of two exact ints — bit-identical
    * across engines. */
  def stopRatio(toks: Column, stopwords: Seq[String]): Column =
    stopwordCount(toks, stopwords).cast("double") / size(toks)

  /** Deterministic rolling document fingerprint over tokens:
    * token -> small int code (first-char code *7 + length), then
    * h := (h*31 + code) mod 2^20, folded left-to-right. Stays far from
    * long overflow (ANSI-safe) and is expressible in DuckDB via
    * list_reduce for the oracle. */
  def fingerprint(toks: Column): Column =
    aggregate(
      transform(toks, t => (ascii(substring(t, 1, 1)) * 7 + length(t)) % 1048576),
      lit(0L),
      (h, c) => (h * 31 + c) % 1048576)

  /** Hashed-feature linear quality classifier (the fastText hashing
    * trick, Joulin et al. 2016 — the CCNet/GPT-3 quality-filter
    * deployment shape: a linear model trained offline, shipped as a
    * weight table, applied in one codegen'd pass with NO vocabulary
    * lookup). Each token folds to its portable char code
    * ([[DedupOps.tokenCode]]'s native kernel), maps to one of `dim`
    * buckets, and draws a closed-form integer milli-weight in
    * [-1000, 1000] (the fixedCentroids discipline: the "trained"
    * artifact is a formula both engines rebuild). The document score
    * is the plain weight sum — same sign as the mean, so keep iff
    * sum >= 0 — and stays integer end to end: value-level
    * oracle-checkable, overflow-free (|w| <= 1000 per token). */
  def qualityScoreMilli(text: Column, dim: Int = 512): Column =
    aggregate(
      transform(
        graft.functions.TextHashExprs.tokenCodesCol(tokens(text), DedupOps.CHAR_M),
        c => ((c % dim + 1L) * 2654435761L) % 2001L - 1000L),
      lit(0L), (a, v) => a + v)

  /** Site-scoped boilerplate line removal (the CCNet line-level dedup /
    * jusText boilerplate rule distilled to its distributable core):
    * within a site, a line is boilerplate iff it occurs in >= minDf
    * distinct documents AND in at least half the site's documents —
    * nav bars, footers and cookie banners repeat site-wide; body text
    * does not. Input is one row per (doc_id, site, pos, line); output
    * one row per document with the surviving lines rejoined in order
    * plus the removed-line count.
    *
    * Scale: line identity shuffles as the 8-byte (site, xxhash64(line))
    * pair (hash-equality stands in for string equality, the exact-dedup
    * precedent); the per-site doc-count side is a dimension-sized
    * broadcast; the reassembly group is bounded by lines-per-document
    * (input-bounded, never corpus-bounded). */
  def stripBoilerplate(lines: DataFrame, minDf: Int = 2): DataFrame = {
    val l = lines.withColumn("line_h", xxhash64(col("line")))
    val siteDocs = l.groupBy("site")
      .agg(countDistinct("doc_id").as("site_docs"))
    val bp = l.groupBy("site", "line_h")
      .agg(countDistinct("doc_id").as("line_df"))
      .join(broadcast(siteDocs), "site")
      .filter(col("line_df") >= minDf && col("line_df") * 2 >= col("site_docs"))
      .select(col("site"), col("line_h"), lit(true).as("bp"))
    l.join(bp, Seq("site", "line_h"), "left")
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(col("pos"),
                when(col("bp").isNull, col("line")).as("line")))),
              x => x.getField("line").isNotNull),
            x => x.getField("line")),
          "\n").as("clean_text"),
        count(col("bp")).as("n_removed"))
  }

  /** Stopword lists for the language-ID heuristic (fixed, documented). */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  /** n-gram/stopword language-ID heuristic: argmax of per-language
    * stopword hits with fixed priority en > es > de on ties. */
  def langId(toks: Column): Column = {
    val en = stopwordCount(toks, langStopwords("en"))
    val es = stopwordCount(toks, langStopwords("es"))
    val de = stopwordCount(toks, langStopwords("de"))
    when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }
}
