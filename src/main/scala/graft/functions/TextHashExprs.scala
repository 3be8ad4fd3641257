package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the portable text-hash family (token char-fold
  * codes, rolling shingle codes, MinHash signatures, SimHash) — the
  * dedup hot loops.
  *
  * The composable forms fold per CHARACTER through interpreted
  * higher-order lambdas (`aggregate(transform(sequence(1, length(t)),
  * i => ascii(substr(i, 1))), ...)`) — one boxed Long and one substring
  * allocation per character, times k=64 permutation scans per doc for
  * MinHash and 31 aggregate passes for SimHash. Each kernel below
  * computes the SAME exact integer sequence in one fused pass
  * (bit-identity spec: TextHashSpec), so the DuckDB oracles that
  * rebuild these hashes stay green.
  *
  * Codegen note: the loops run in static helper methods invoked from
  * the generated code (one call per row) — string/codepoint iteration
  * is kept out of Janino while the per-element lambda interpretation
  * overhead disappears.
  */
object TextHashExprs {

  // ---------------- static helpers (generated code calls these) -----

  /** (h*131 + codepoint) % m folded left-to-right per character;
    * "" -> 0. Matches the composable form's `ascii(substr(i, 1))`
    * exactly: substr steps by codepoints and Spark 4's ascii returns
    * the full codepoint (verified for supplementary-plane chars in
    * TextHashSpec), which is also DuckDB `ord()`. */
  def tokenCodeOf(t: UTF8String, m: Long): Long = {
    val s = t.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp) % m
      i += Character.charCount(cp)
    }
    h
  }

  /** array<string> -> array<long>; null token -> null code. */
  def tokenCodes(arr: ArrayData, m: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) null
        else tokenCodeOf(arr.getUTF8String(i), m)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct rolling n-window codes over the per-token char codes,
    * FIRST-OCCURRENCE order (array_distinct semantics); fewer than n
    * tokens -> empty array. A null token nulls the windows covering it
    * (mirroring the lambda arithmetic), deduped like any value. */
  def shingleCodes(tokens: ArrayData, n: Int, charM: Long, p: Long): ArrayData = {
    val nt = tokens.numElements()
    if (nt < n) return new GenericArrayData(Array.empty[Any])
    val codes = new Array[Long](nt)
    val isNull = new Array[Boolean](nt)
    var i = 0
    while (i < nt) {
      if (tokens.isNullAt(i)) isNull(i) = true
      else codes(i) = tokenCodeOf(tokens.getUTF8String(i), charM)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[Any]()
    i = 0
    while (i <= nt - n) {
      var h = 0L
      var anyNull = false
      var j = 0
      while (j < n && !anyNull) {
        if (isNull(i + j)) anyNull = true
        else h = (h * 8191L + codes(i + j)) % p
        j += 1
      }
      seen.add(if (anyNull) null else java.lang.Long.valueOf(h))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** k permutation minima over the shingle codes: min_x (a_i*x+b_i)%p.
    * Empty input -> null minima (array_min-of-empty semantics); null
    * codes are skipped exactly as array_min skips nulls. */
  def minhashSig(shc: ArrayData, as: Array[Long], bs: Array[Long],
                 p: Long): ArrayData = {
    val n = shc.numElements()
    val k = as.length
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      val a = as(i); val b = bs(i)
      var min = Long.MaxValue
      var any = false
      var j = 0
      while (j < n) {
        if (!shc.isNullAt(j)) {
          val v = (a * shc.getLong(j) + b) % p
          if (v < min) min = v
          any = true
        }
        j += 1
      }
      out(i) = if (any) java.lang.Long.valueOf(min) else null
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash over token-hash array: bit b set iff
    * Σ (((h>>b)&1)*2 - 1) > 0; null hashes poison every bit sum to
    * null, making the signature 0 (the lambda form's arithmetic). */
  def simhashSig(hs: ArrayData, bits: Int): Long = {
    val n = hs.numElements()
    var j = 0
    while (j < n) { // null element => every bit-count null => sig 0
      if (hs.isNullAt(j)) return 0L
      j += 1
    }
    val cnt = new Array[Long](bits)
    j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < bits) {
        cnt(b) += ((h >> b) & 1L) * 2L - 1L
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (cnt(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** |array_intersect(a, b)| for two long arrays WITHOUT materializing
    * the intersection: sort b's non-null values once, then count each
    * FIRST occurrence of a distinct a-element found by binary search —
    * O((m+n) log n), zero boxing, no hash map, no output array. Null
    * elements follow ArrayIntersect exactly: a null in both sides
    * contributes one. Matches `size(array_intersect(a, b))`
    * bit-for-bit (TextHashSpec), which is the exact-verification hot
    * loop of every shingle-Jaccard path. */
  def intersectCountLong(a: ArrayData, b: ArrayData): Int = {
    val nb = b.numElements()
    var bHasNull = false
    val bv = new Array[Long](nb)
    var m = 0
    var i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true
      else { bv(m) = b.getLong(i); m += 1 }
      i += 1
    }
    val bs = if (m == nb) bv else java.util.Arrays.copyOf(bv, m)
    java.util.Arrays.sort(bs, 0, m)
    val na = a.numElements()
    var aHasNull = false
    val av = new Array[Long](na)
    var k = 0
    i = 0
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true
      else { av(k) = a.getLong(i); k += 1 }
      i += 1
    }
    java.util.Arrays.sort(av, 0, k)
    var cnt = 0
    i = 0
    while (i < k) {
      if ((i == 0 || av(i) != av(i - 1)) &&
          java.util.Arrays.binarySearch(bs, 0, m, av(i)) >= 0) cnt += 1
      i += 1
    }
    if (aHasNull && bHasNull) cnt += 1
    cnt
  }

  // ---------------- expressions -------------------------------------

  private val HELPER = "graft.functions.TextHashExprs"

  private def strArrayCheck(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name needs array<string>, got ${other.simpleString}")
    }

  private def longArrayCheck(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name needs array<long>, got ${other.simpleString}")
    }

  case class TokenCodes(child: Expression, m: Long) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      strArrayCheck(child, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "token_codes"
    override def nullSafeEval(a: Any): Any =
      tokenCodes(a.asInstanceOf[ArrayData], m)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = $HELPER.tokenCodes($a, ${m}L);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class ShingleCodes(child: Expression, n: Int, charM: Long, p: Long)
      extends UnaryExpression {
    require(n >= 1, "shingle width must be >= 1")
    override def checkInputDataTypes(): TypeCheckResult =
      strArrayCheck(child, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = s"shingle_codes_$n"
    override def nullSafeEval(a: Any): Any =
      shingleCodes(a.asInstanceOf[ArrayData], n, charM, p)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = $HELPER.shingleCodes($a, $n, ${charM}L, ${p}L);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long],
                        p: Long) extends UnaryExpression {
    require(as.length == bs.length && as.nonEmpty, "k permutation coefficients")
    override def checkInputDataTypes(): TypeCheckResult =
      longArrayCheck(child, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = s"minhash_sig_${as.length}"
    override def nullSafeEval(a: Any): Any =
      minhashSig(a.asInstanceOf[ArrayData], as, bs, p)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("mhA", as, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = $HELPER.minhashSig($a, $aRef, $bRef, ${p}L);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def equals(o: Any): Boolean = o match {
      case MinHashSig(c2, a2, b2, p2) => child == c2 && p == p2 &&
        java.util.Arrays.equals(as, a2) && java.util.Arrays.equals(bs, b2)
      case _ => false
    }
    override def hashCode(): Int =
      31 * child.hashCode() + java.util.Arrays.hashCode(as)
  }

  case class SimHashSig(child: Expression, bits: Int) extends UnaryExpression {
    require(bits >= 1 && bits <= 62, s"bits out of range: $bits")
    override def checkInputDataTypes(): TypeCheckResult =
      longArrayCheck(child, prettyName)
    override def dataType: DataType = LongType
    override def prettyName: String = s"simhash_sig_$bits"
    override def nullSafeEval(a: Any): Any =
      simhashSig(a.asInstanceOf[ArrayData], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = $HELPER.simhashSig($a, $bits);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class IntersectCountLong(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (longArrayCheck(left, prettyName), longArrayCheck(right, prettyName)) match {
        case (TypeCheckResult.TypeCheckSuccess, r) => r
        case (l, _) => l
      }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "intersect_count"
    override def nullSafeEval(a: Any, b: Any): Any =
      intersectCountLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = $HELPER.intersectCountLong($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // ---------------- column wrappers ---------------------------------

  def intersectCountCol(a: Column, b: Column): Column =
    shim.column(IntersectCountLong(shim.expression(a), shim.expression(b)))

  def tokenCodesCol(tokens: Column, m: Long): Column =
    shim.column(TokenCodes(shim.expression(tokens), m))

  def shingleCodesCol(tokens: Column, n: Int, charM: Long, p: Long): Column =
    shim.column(ShingleCodes(shim.expression(tokens), n, charM, p))

  def minhashSigCol(shc: Column, params: Seq[(Long, Long)], p: Long): Column =
    shim.column(MinHashSig(shim.expression(shc),
      params.map(_._1).toArray, params.map(_._2).toArray, p))

  def simhashSigCol(hs: Column, bits: Int): Column =
    shim.column(SimHashSig(shim.expression(hs), bits))
}
