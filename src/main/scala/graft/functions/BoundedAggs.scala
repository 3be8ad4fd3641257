package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Bounded-memory grouped aggregation (the at-scale replacement for
  * unbounded `collect_set`/`collect_list` witness buffers): a typed
  * `Aggregator` whose state is capped at K elements no matter the group
  * fan-in, plus an EXACT total row count kept separately.
  *
  * The reference buffers whole per-edge evidence lists in memory
  * (ppi_adapter.py:1290-1299 pubmed lists); at 10^12 pages one popular
  * edge's witness list is an OOM on a single reducer. Keeping the K
  * lexicographically-smallest distinct witnesses (a deterministic,
  * order-insensitive choice — no "first seen" partition dependence)
  * plus the exact count preserves the queryable semantics (bounded
  * provenance sample + true support) in O(K) state per group.
  *
  * State discipline: the kept set is exactly the K smallest DISTINCT
  * values seen — an element evicted by K smaller ones can never
  * re-enter (any later occurrence compares >= the current max), so
  * dedup-among-kept is dedup-exact for the output. The `total` field
  * counts every non-null input row (NOT distinct values): callers whose
  * rows are pre-deduplicated per group (e.g. one row per witness url)
  * get an exact distinct count; callers with duplicate rows get an
  * exact row count (document which one you mean).
  */
object BoundedAggs {

  /** Output: K smallest distinct strings (ascending) + exact non-null
    * input row count. */
  final case class TopKState(items: Array[String], total: Long)

  /** ACCUMULATION buffer for the top-K aggregators: same sorted-distinct
    * prefix as [[TopKState]], but with a logical length `n` decoupled
    * from the array's capacity so inserts grow the array amortized
    * (capacity doubling) and shift IN PLACE instead of allocating a new
    * array per accepted element — the old per-insert `new Array` +
    * double arraycopy made a d-witness group cost O(d²) element copies
    * plus d short-lived arrays of GC pressure (the dominant cost of the
    * evidence aggregation at 4M witness rows). Only `finish` exposes
    * state to callers, trimmed to `n`, so capacity never escapes. */
  final case class TopKBuf(items: Array[String], n: Int, total: Long)

  /** Compare two strings in UTF-8 binary (= code point) order — the
    * collation Spark's UTF8String and DuckDB's list_sort use. Java's
    * String.compareTo orders by UTF-16 code unit, which ranks
    * U+E000..U+FFFF ABOVE supplementary-plane characters (whose high
    * surrogates are 0xD800-0xDBFF) — the opposite of byte order; the
    * "kept K smallest" set would silently diverge from the oracle on
    * such values. Allocation-free: walks code points only past the
    * common prefix. Unpaired surrogates compare by their own value,
    * which equals their 3-byte UTF-8 encoding's rank. */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    val n = math.min(la, lb)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i)
      val cb = b.charAt(i)
      if (ca != cb) {
        val cpa = if (Character.isHighSurrogate(ca) && i + 1 < la &&
          Character.isLowSurrogate(a.charAt(i + 1))) a.codePointAt(i) else ca.toInt
        val cpb = if (Character.isHighSurrogate(cb) && i + 1 < lb &&
          Character.isLowSurrogate(b.charAt(i + 1))) b.codePointAt(i) else cb.toInt
        return Integer.compare(cpa, cpb)
      }
      i += 1
    }
    Integer.compare(la, lb)
  }

  /** [[utf8Compare]] as an Ordering — for driver-side dimension work
    * that must match Spark's string-min collation exactly. */
  val utf8Ordering: Ordering[String] = (a: String, b: String) => utf8Compare(a, b)

  /** Binary search insertion point in a sorted array; returns
    * (index << 1) | (1 if exact match else 0). */
  private def searchSorted(a: Array[String], n: Int, s: String): Int = {
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = utf8Compare(a(mid), s)
      if (c == 0) return (mid << 1) | 1
      else if (c < 0) lo = mid + 1
      else hi = mid
    }
    lo << 1
  }

  final class TopKStringsAgg(k: Int)
      extends Aggregator[String, TopKBuf, TopKState] {
    require(k > 0, "cap must be positive")

    override def zero: TopKBuf = TopKBuf(Array.empty, 0, 0L)

    override def reduce(b: TopKBuf, s: String): TopKBuf = {
      if (s == null) return b
      val n = b.n
      val total = b.total + 1
      // Fast path once the buffer is full: anything >= the current max
      // is either a duplicate of the max or can never be kept.
      if (n >= k && utf8Compare(b.items(n - 1), s) <= 0)
        return TopKBuf(b.items, n, total)
      val r = searchSorted(b.items, n, s)
      if ((r & 1) == 1) return TopKBuf(b.items, n, total) // duplicate among kept
      val idx = r >> 1
      if (n < k) {
        // room to grow: amortized capacity doubling, in-place tail shift
        val items =
          if (n < b.items.length) b.items
          else java.util.Arrays.copyOf(
            b.items, math.min(math.max(8, b.items.length * 2), k))
        System.arraycopy(items, idx, items, idx + 1, n - idx)
        items(idx) = s
        TopKBuf(items, n + 1, total)
      } else {
        // full: insert, dropping the current max (last slot) in place
        System.arraycopy(b.items, idx, b.items, idx + 1, k - 1 - idx)
        b.items(idx) = s
        TopKBuf(b.items, k, total)
      }
    }

    override def merge(a: TopKBuf, c: TopKBuf): TopKBuf = {
      val x = a.items; val y = c.items
      val out = new Array[String](math.min(a.n + c.n, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.n || j < c.n)) {
        val cmp =
          if (i >= a.n) 1
          else if (j >= c.n) -1
          else utf8Compare(x(i), y(j))
        if (cmp < 0) { out(o) = x(i); i += 1; o += 1 }
        else if (cmp > 0) { out(o) = y(j); j += 1; o += 1 }
        else { out(o) = x(i); i += 1; j += 1; o += 1 }
      }
      TopKBuf(out, o, a.total + c.total)
    }

    override def finish(r: TopKBuf): TopKState =
      TopKState(
        if (r.n == r.items.length) r.items else java.util.Arrays.copyOf(r.items, r.n),
        r.total)
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKState] = Encoders.product[TopKState]
  }

  /** Column-usable UDAF over a string column: struct(items, total). */
  def topKCount(k: Int): UserDefinedFunction =
    udaf(new TopKStringsAgg(k), Encoders.STRING)

  /** Bounded variant of [[Aggs.pipeSetUnionAgg]]: set-union of
    * '|'-joined multi-value strings capped at the K smallest distinct
    * elements, emitted sorted. Null/empty inputs contribute nothing;
    * an all-null group yields null (the reference's NaN), matching the
    * unbounded rule. */
  final class PipeSetUnionCappedAgg(k: Int)
      extends Aggregator[String, TopKBuf, String] {
    private val inner = new TopKStringsAgg(k)
    override def zero: TopKBuf = inner.zero
    override def reduce(b: TopKBuf, s: String): TopKBuf = {
      if (s == null || s.isEmpty) return b
      var acc = b
      var start = 0
      var i = 0
      while (i <= s.length) {
        if (i == s.length || s.charAt(i) == '|') {
          if (i > start) acc = inner.reduce(acc, s.substring(start, i))
          start = i + 1
        }
        i += 1
      }
      acc
    }
    override def merge(a: TopKBuf, c: TopKBuf): TopKBuf = inner.merge(a, c)
    override def finish(r: TopKBuf): String =
      if (r.n == 0) null else {
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < r.n) {
          if (i > 0) sb.append('|')
          sb.append(r.items(i))
          i += 1
        }
        sb.toString
      }
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  def pipeSetUnionCapped(k: Int): UserDefinedFunction =
    udaf(new PipeSetUnionCappedAgg(k), Encoders.STRING)

  /** Posting-list state: collected ids (stops growing past cap+1) +
    * EXACT input row count. `n` is the logical element count — `items`
    * may be over-allocated (amortized doubling in reduce; the old
    * `items :+ x` re-copied the whole array per input row, making a
    * d-element posting cost O(d²) element copies — the dominant
    * aggregation cost of the dense-posting co-occurrence families).
    * Only [[CappedLongListAgg.finish]] exposes the state to callers,
    * and it trims to `n`, so the over-allocation never escapes. */
  final case class LongListState(items: Array[Long], n: Int, total: Long)

  /** Bounded posting-list collection for inverted-index builds: keeps
    * at most `cap`+1 collected ids per group — one element beyond the
    * cap, exactly enough to witness overflow — while the `total` field
    * counts every input row exactly. The scale contract: a stopword
    * shingle whose posting list is O(corpus) (10^6+ documents) holds
    * O(cap) reducer state instead of buffering the full list the way
    * `collect_list` does, and the caller detects it via total > cap and
    * drops it. For groups with total <= cap the kept list is COMPLETE
    * (no truncation can have happened), emitted sorted ascending.
    *
    * Input rows must be distinct per group for `total` to be a distinct
    * count (the inverted-index caller guarantees one (doc, shingle) row
    * per doc via per-doc array_distinct). Which elements survive an
    * overflowing group is partition-order-dependent — by design: those
    * groups are only ever DETECTED (and excluded), never consumed. */
  final class CappedLongListAgg(cap: Int)
      extends Aggregator[Long, LongListState, LongListState] {
    require(cap > 0, "cap must be positive")

    override def zero: LongListState = LongListState(Array.empty, 0, 0L)

    override def reduce(b: LongListState, x: Long): LongListState = {
      if (b.n > cap) return LongListState(b.items, b.n, b.total + 1)
      // Amortized growth (capacity doubles, clamped to cap+1): O(1)
      // per row instead of the O(n) full-array re-copy of `items :+ x`.
      // Mutating the buffer in place and returning it is the standard
      // Aggregator reduce contract.
      val items =
        if (b.n < b.items.length) b.items
        else {
          val newCap = math.min(math.max(16, b.items.length * 2), cap + 1)
          java.util.Arrays.copyOf(b.items, newCap)
        }
      items(b.n) = x
      LongListState(items, b.n + 1, b.total + 1)
    }

    override def merge(a: LongListState, c: LongListState): LongListState = {
      val keep = math.min(a.n + c.n, cap + 1)
      val out = new Array[Long](keep)
      val fromA = math.min(a.n, keep)
      System.arraycopy(a.items, 0, out, 0, fromA)
      System.arraycopy(c.items, 0, out, fromA, keep - fromA)
      LongListState(out, keep, a.total + c.total)
    }

    override def finish(r: LongListState): LongListState = {
      // sorted output only matters for complete (non-overflowed) lists,
      // but sorting <= cap+1 elements unconditionally is trivial
      val s = java.util.Arrays.copyOf(r.items, r.n)
      java.util.Arrays.sort(s)
      LongListState(s, r.n, r.total)
    }
    override def bufferEncoder: Encoder[LongListState] =
      Encoders.product[LongListState]
    override def outputEncoder: Encoder[LongListState] =
      Encoders.product[LongListState]
  }

  /** Column-usable UDAF over a long column: struct(items, total). */
  def cappedLongList(cap: Int): UserDefinedFunction =
    udaf(new CappedLongListAgg(cap), Encoders.scalaLong)
}
