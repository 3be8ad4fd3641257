package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.textops.{Bpe, TextOps}

/** The BPE merge-table tokenizer: training determinism, application
  * invariants, and the native expression's bit-identity with the pure
  * function. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("training is deterministic and learns the full merge budget") {
    val m1 = Bpe.train(Bpe.TrainingCorpus, Bpe.NumMerges)
    val m2 = Bpe.train(Bpe.TrainingCorpus, Bpe.NumMerges)
    assert(m1 == m2)
    assert(m1.size == Bpe.NumMerges)
    assert(m1.distinct.size == m1.size) // a pair is learned at most once
  }

  test("hot training words collapse to few tokens; unseen words stay near char-level") {
    // 'the' is the hottest corpus word: its space-prefixed form must
    // fuse into a single token within the merge budget
    assert(Bpe.encode(" the").length == 1)
    assert(Bpe.countTokens(" the") < " the".length)
    // a word sharing no learned pair stays fully char-split
    assert(Bpe.encode("zzz") == Seq("z", "z", "z"))
  }

  test("encode invariants: concatenation restores the word, count bounded by length") {
    val words = Seq(" the", " batch", "merge", " spark", "query", "x",
      " unseen", "zq", "")
    words.foreach { w =>
      val toks = Bpe.encode(w)
      assert(toks.mkString == w, s"lossy encode of '$w'")
      assert(toks.length <= math.max(w.length, 0))
      assert(Bpe.countTokens(w) == toks.length)
    }
  }

  test("merges-applied-in-order equals leftmost-best-pair application") {
    // the equivalence the oracle relies on: replaying merges rank by
    // rank (all occurrences) yields the same segmentation as the
    // engine's leftmost-best-pair loop
    def applyInOrder(w: String): Seq[String] = {
      var syms = w.toCharArray.map(_.toString).toVector
      Bpe.merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toVector
      }
      syms
    }
    val words = Seq(" the", " batch", " stream", "merge", " data",
      " customer", " window", "aa", " lines")
    words.foreach(w => assert(Bpe.encode(w) == applyInOrder(w), s"word '$w'"))
  }

  test("the native expression matches the pure function") {
    val texts = Seq(
      (1L, "the batch merge join data line"),
      (2L, "spark stream window query unseen zq"),
      (3L, "a"),
      (4L, "customer value column agg"))
    val expected = texts.map { case (id, t) =>
      val m = java.util.regex.Pattern.compile(TextOps.BpeishPattern).matcher(t)
      var n = 0
      while (m.find()) n += Bpe.countTokens(m.group())
      (id, n)
    }.toSet
    val got = texts.toDF("doc_id", "text")
      .select($"doc_id", TextOps.bpeTokenCount($"text").as("n"))
      .as[(Long, Int)].collect().toSet
    assert(got == expected)
    // BPE counts exceed pre-token counts only when merges are disabled:
    // with the table applied, every count is >= the pre-token count
    // (each pre-token yields >= 1 token) and <= the char count
    val cmp = texts.toDF("doc_id", "text").select(
      TextOps.bpeishTokenCount($"text").as("pre"),
      TextOps.bpeTokenCount($"text").as("bpe"),
      length($"text").as("chars")).as[(Int, Int, Int)].collect()
    cmp.foreach { case (pre, bpe, chars) =>
      assert(bpe >= pre && bpe <= chars)
    }
  }
}
