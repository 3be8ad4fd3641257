package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BoundedAggs
import graft.functions.BoundedAggs.{TopKBuf, TopKState, TopKStringsAgg}

/** Algebraic laws of the bounded top-K+count aggregation state — the
  * foundation BOTH the distributed aggregation (Spark merges partial
  * states in arbitrary tree shapes) and the salted hub-key variant
  * (Salted.topKCountSalted) rest on. Checked deterministically over
  * seeded scalacheck generators: no matter how a multiset of inputs is
  * partitioned, ordered, or merge-tree-shaped, the result is the K
  * smallest distinct values + the exact row count.
  */
class AggLawsSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val k = 8
  private val agg = new TopKStringsAgg(k)

  private def reduceAll(xs: Seq[String]): TopKBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  /** The observable value of a buffer state (capacity trimmed). */
  private def fin(s: TopKBuf): TopKState = agg.finish(s)

  /** UTF-8 binary order via Spark's own UTF8String — the collation the
    * engine's shuffles/sorts and the DuckDB oracles use. */
  private val utf8Order: Ordering[String] = (a: String, b: String) =>
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** The specification: K smallest distinct (UTF-8 binary order) +
    * exact non-null count. */
  private def spec(xs: Seq[String]): (Seq[String], Long) = {
    val nonNull = xs.filter(_ != null)
    (nonNull.distinct.sorted(utf8Order).take(k), nonNull.size.toLong)
  }

  private def assertMatchesSpec(b: TopKBuf, xs: Seq[String]): Unit = {
    val (items, total) = spec(xs)
    val s = fin(b)
    assert(s.items.toSeq == items)
    assert(s.total == total)
  }

  private val tokenGen: Gen[String] =
    Gen.oneOf(
      Gen.const(null: String),
      Gen.alphaNumStr.map(_.take(6)),
      Gen.chooseNum(0, 20).map(i => s"w$i"), // heavy duplication
      // the UTF-16-vs-UTF-8 ordering trap: BMP private-use chars
      // (U+E000..U+FFFD) sort ABOVE supplementary-plane chars in
      // UTF-16 code-unit order but BELOW them in UTF-8 byte order
      Gen.oneOf("\uE000", "\uFFFD", "\uD83D\uDE00" /* U+1F600 */ ,
        "\uD800\uDC00" /* U+10000 */ , "a\uE000", "a\uD83D\uDE00"))

  private val listGen: Gen[List[String]] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, tokenGen))

  test("sequential reduce matches the K-smallest-distinct + exact-count specification") {
    forAllSeeded(listGen) { xs => assertMatchesSpec(reduceAll(xs), xs) }
  }

  test("merge is partition-invariant: any split point gives the same state as one pass") {
    val gen = for {
      xs <- listGen
      cut <- Gen.chooseNum(0, xs.size)
    } yield (xs, cut)
    forAllSeeded(gen) { case (xs, cut) =>
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(reduceAll(a), reduceAll(b))
      assertMatchesSpec(merged, xs)
    }
  }

  test("merge is commutative and associative (arbitrary merge-tree shapes collapse)") {
    val gen = for {
      a <- listGen; b <- listGen; c <- listGen
    } yield (a, b, c)
    forAllSeeded(gen) { case (a, b, c) =>
      val (sa, sb, sc) = (reduceAll(a), reduceAll(b), reduceAll(c))
      val left = agg.merge(agg.merge(sa, sb), sc)
      val right = agg.merge(sa, agg.merge(sb, sc))
      val comm = agg.merge(agg.merge(sc, sb), sa)
      assert(fin(left).items.toSeq == fin(right).items.toSeq &&
        left.total == right.total)
      assert(fin(left).items.toSeq == fin(comm).items.toSeq &&
        left.total == comm.total)
      assertMatchesSpec(left, a ++ b ++ c)
    }
  }

  test("zero is the merge identity") {
    forAllSeeded(listGen) { xs =>
      val s = reduceAll(xs)
      val l = agg.merge(agg.zero, s)
      val r = agg.merge(s, agg.zero)
      assert(fin(l).items.toSeq == fin(s).items.toSeq && l.total == s.total)
      assert(fin(r).items.toSeq == fin(s).items.toSeq && r.total == s.total)
    }
  }

  test("utf8Compare agrees in sign with UTF8String (UTF-8 byte order) incl. supplementary plane") {
    val pairGen = for {
      a <- tokenGen if a != null
      b <- tokenGen if b != null
    } yield (a, b)
    forAllSeeded(pairGen, n = 500) { case (a, b) =>
      val got = BoundedAggs.utf8Compare(a, b)
      val want = utf8Order.compare(a, b)
      assert(Integer.signum(got) == Integer.signum(want),
        s"utf8Compare('$a','$b') sign mismatch: $got vs $want")
    }
    // the canonical trap pair: U+FFFD (BMP) vs U+1F600 (supplementary)
    assert("\uFFFD".compareTo("\uD83D\uDE00") > 0) // UTF-16 order: WRONG way
    assert(BoundedAggs.utf8Compare("\uFFFD", "\uD83D\uDE00") < 0) // UTF-8 order
  }

  test("salted cell decomposition: per-cell states (salt by value) merge to the global state") {
    val gen = for {
      xs <- listGen
      salts <- Gen.chooseNum(1, 7)
    } yield (xs, salts)
    forAllSeeded(gen) { case (xs, salts) =>
      // value-hash salting: every occurrence of a value lands in one cell
      val cells = xs.filter(_ != null)
        .groupBy(v => math.floorMod(v.hashCode, salts))
        .values.toList
      val merged = cells.map(reduceAll).foldLeft(agg.zero)(agg.merge)
      assertMatchesSpec(merged, xs)
    }
  }
}
