package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types._

/** Streaming unordered-pair generation — the co-occurrence hot loop.
  *
  * The composable form of "all i<j pairs of one posting list"
  * (`explode(flatten(transform(sequence(...), i => transform(slice(ds,
  * i+2, ...), ...))))`) materializes the FULL d·(d−1)/2-element pair
  * array per row before exploding, and each `slice` copies the tail of
  * the posting besides — a d=1,000 posting allocates ~1.5M array
  * elements to emit 500k pairs, which made the pair explosion itself
  * (not the downstream aggregation) the dominant CPU of the
  * shares_part / co_purchased_with edge families. [[UnorderedPairs]]
  * is a Generator that yields the identical (k1, k2) pair stream in
  * O(1) memory: no pair array, no slice copies, one reused output row
  * (GenerateExec projects each generated row to an UnsafeRow before
  * pulling the next, so reuse is safe — the same contract Spark's own
  * JsonTuple relies on).
  *
  * Pair order and values are IDENTICAL to the composable form
  * (i ascending, then j ascending), so every downstream
  * groupBy/distinct consumer is value-unchanged; PairGenSpec asserts
  * row-for-row equality against the transform/slice/flatten form.
  */
object PairExprs {

  /** All unordered index pairs (arr(i), arr(j)), i < j, as rows
    * (k1, k2) of the element type. Null/short arrays generate nothing
    * (matching the composable form, whose sequence(0, size-2) is empty
    * below 2 elements). */
  case class UnorderedPairs(child: Expression)
      extends UnaryExpression with Generator with CodegenFallback {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unordered_pairs needs an array column, got ${other.simpleString}")
    }

    private lazy val elementType =
      child.dataType.asInstanceOf[ArrayType].elementType

    override def elementSchema: StructType = StructType(Seq(
      StructField("k1", elementType, nullable = true),
      StructField("k2", elementType, nullable = true)))

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val arr = child.eval(input).asInstanceOf[ArrayData]
      if (arr == null) return Iterator.empty
      val n = arr.numElements()
      if (n < 2) return Iterator.empty
      val et = elementType
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        private val row = new GenericInternalRow(2)
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          row.update(0, if (arr.isNullAt(i)) null else arr.get(i, et))
          row.update(1, if (arr.isNullAt(j)) null else arr.get(j, et))
          j += 1
          if (j == n) { i += 1; j = i + 1 }
          row
        }
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column form: select this (optionally via `.as(Seq("k1", "k2"))`)
    * exactly like `explode(...)` — Catalyst extracts the generator into
    * a Generate node. */
  def unorderedPairs(arr: Column): Column =
    shim.column(UnorderedPairs(shim.expression(arr)))
}
