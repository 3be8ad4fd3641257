package graft.textops

import scala.collection.mutable

/** Byte-pair-encoding merge-table tokenizer (VERDICT r5 Missing #3):
  * the PUBLIC BPE algorithm (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — a merge
  * table trained once from a fixed corpus, then applied after the
  * GPT-2-style pre-tokenizer ([[TextOps.bpeishTokens]]) to count LLM
  * tokens properly instead of approximating with pre-token counts.
  *
  * Determinism contract (everything must replay bit-for-bit in the
  * DuckDB oracle):
  *  - the training corpus is a FIXED code constant (a merge table is a
  *    model artifact, versioned with the code the way a real tokenizer
  *    ships its merges file — never re-trained per input);
  *  - training ties break lexicographically (most-frequent pair, then
  *    smallest (a, b));
  *  - application merges the LEFTMOST occurrence of the best-ranked
  *    adjacent pair, one merge per step, until no table pair remains.
  *    This yields the same segmentation as the usual all-occurrences
  *    loop (a pair created by a merge can only rank WORSE than the pair
  *    just merged, since its symbol did not exist earlier in training),
  *    and is directly expressible as a recursive CTE for the oracle —
  *    [[mergeRankCaseSql]] generates the rank lookup from the SAME
  *    learned table (the hashParams pattern).
  */
object Bpe {

  /** Merge-table size: enough to fuse the corpus' hot words into single
    * tokens while leaving rare words multi-token. */
  val NumMerges = 48

  /** Fixed training text over the engine-domain vocabulary the
    * synthetic documents draw from, with skewed frequencies (hot words
    * repeated) so the learned merges are meaningful. */
  val TrainingCorpus: String = {
    val hot = "the batch merge join data line sort stream spark table "
    val warm = "filter scan window query row part order key hash group "
    val cold = "agg column value customer small big fast slow dup a "
    hot * 8 + warm * 3 + cold
  }

  private def preTokens(text: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(TextOps.BpeishPattern).matcher(text)
    val out = mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toSeq
  }

  /** Left-to-right non-overlapping merge of ALL occurrences of `pair`
    * (the canonical training-side vocab update). */
  private def mergeAll(syms: List[String], pair: (String, String)): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    var rest = syms
    while (rest.nonEmpty) rest match {
      case a :: b :: tail if a == pair._1 && b == pair._2 =>
        out += a + b; rest = tail
      case a :: tail => out += a; rest = tail
      case Nil => ()
    }
    out.toList
  }

  /** Sennrich-style training: count adjacent symbol pairs over the
    * frequency-weighted word vocabulary, merge the most frequent pair
    * (lexicographic tie-break), repeat. */
  def train(corpus: String, nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] = preTokens(corpus)
      .groupBy(identity).map { case (w, ws) =>
        w.toList.map(_.toString) -> ws.size.toLong
      }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < nMerges) {
      val counts = mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) continue = false
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.toSeq.map { case (syms, f) => (mergeAll(syms, best), f) }
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
    }
    merges.toSeq
  }

  /** The learned merge table (rank = position; lower merges first). */
  lazy val merges: Seq[(String, String)] = train(TrainingCorpus, NumMerges)

  lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

  /** Apply the merge table to one pre-token: leftmost occurrence of the
    * best-ranked adjacent pair, one merge per step. */
  def encode(word: String): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms = word.toCharArray.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPos = i }
        i += 1
      }
      if (bestPos < 0) done = true
      else syms = (syms.take(bestPos) :+ (syms(bestPos) + syms(bestPos + 1))) ++
        syms.drop(bestPos + 2)
    }
    syms
  }

  /** BPE token count for one pre-token. */
  def countTokens(word: String): Int = encode(word).length

  /** Codegen helper: total BPE token count over a pre-token array (one
    * static call per row from the generated code — the TextHashExprs
    * discipline). Null elements count 0. */
  def countTokensArr(arr: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = arr.numElements()
    var total = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) total += countTokens(arr.getUTF8String(i).toString)
      i += 1
    }
    total
  }

  private def sqlQuote(s: String): String = s.replace("'", "''")

  /** The rank lookup as a generated SQL CASE over (a, b) — one arm per
    * learned merge, emitted from the SAME table the engine applies. */
  def mergeRankCaseSql(a: String, b: String): String = {
    val arms = merges.zipWithIndex.map { case ((x, y), r) =>
      s"WHEN $a = '${sqlQuote(x)}' AND $b = '${sqlQuote(y)}' THEN $r"
    }.mkString(" ")
    s"CASE $arms ELSE NULL END"
  }
}
