package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._

import BoundedAggs.{TopKBuf, TopKState, TopKStringsAgg}

/** Salting for hub keys (north-star: "salted keys for hub entities").
  *
  * A grouped aggregation whose per-group state is order-insensitive and
  * whose merge is associative can be split into two shuffles:
  * `groupBy(key, salt)` partials, then `groupBy(key)` merging the
  * partial states. One pathological hub key (an entity mentioned on
  * 10^9 pages) then lands on `salts` reducers instead of one, at the
  * cost of a second (tiny — one row per (key, salt)) shuffle.
  *
  * Spark's own map-side partial aggregation gives this for free for
  * sum/count; it does NOT bound reducer-side state for set-like
  * aggregates once partial maps spill. The salted form caps the
  * per-reducer state of [[BoundedAggs.topKCount]] at O(K) per
  * (key, salt) cell EXACTLY — [[BoundedAggs.TopKState]]'s merge (K
  * smallest distinct + exact total) is associative and commutative, so
  * the salted result is bit-identical to the unsalted one (spec-proven
  * on a synthetic hub key).
  */
object Salted {

  /** Phase-2 aggregator: merges TopKState partials (from the salted
    * phase-1 groupBy) into the final TopKState. */
  final class TopKMergeAgg(k: Int)
      extends Aggregator[TopKState, TopKBuf, TopKState] {
    private val inner = new TopKStringsAgg(k)
    override def zero: TopKBuf = inner.zero
    override def reduce(b: TopKBuf, s: TopKState): TopKBuf =
      if (s == null) b
      else inner.merge(b, TopKBuf(s.items, s.items.length, s.total))
    override def merge(a: TopKBuf, c: TopKBuf): TopKBuf = inner.merge(a, c)
    override def finish(r: TopKBuf): TopKState = inner.finish(r)
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKState] = Encoders.product[TopKState]
  }

  def topKMerge(k: Int): UserDefinedFunction =
    udaf(new TopKMergeAgg(k), Encoders.product[TopKState])

  /** Salted bounded witness aggregation: exactly
    * `df.groupBy(keys).agg(topKCount(k)(values))` but with the hub-key
    * fan-in spread over `salts` reducers. The salt is derived from the
    * VALUE (xxhash64 mod salts), so duplicates of one witness land in
    * one cell and the distinct semantics are preserved cell-locally.
    * Output: keys..., wit struct(items array<string>, total bigint). */
  def topKCountSalted(df: DataFrame, keys: Seq[String], value: Column,
                      k: Int, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val kc = keys.map(col)
    val partial = df
      .withColumn("__salt", pmod(xxhash64(value), lit(salts.toLong)))
      .groupBy((kc :+ col("__salt")): _*)
      .agg(BoundedAggs.topKCount(k)(value).as("wit_part"))
    // product-encoded UDAF input arrives flattened: (items, total)
    partial
      .groupBy(kc: _*)
      .agg(topKMerge(k)(col("wit_part.items"), col("wit_part.total")).as("wit"))
  }
}
