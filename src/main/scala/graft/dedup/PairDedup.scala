package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Undirected-pair deduplication — the reference's most idiosyncratic
  * operator (SURVEY.md §2.5): (a,b) and (b,a) with the same
  * type/system/score are duplicates; keep the best-scored one.
  *
  * Reference implementation is `~df[cols].apply(frozenset, axis=1)
  * .duplicated()` (ppi_adapter.py:346-363, :561-578, :768-784;
  * drug_adapter.py:1052-1056; disease_adapter.py:1494-1498). We
  * implement the INTENDED semantics — canonical pair ordering +
  * windowed top-1 — not the frozenset accident where {a,b,type}
  * collapses when type == a (documented divergence, SURVEY.md §7.3
  * hard-part 2).
  *
  * Scale: one shuffle on the canonical pair key; the window is a
  * row_number (no full sort of the partition beyond the group).
  */
object PairDedup {

  /** Add canonical pair columns k1 <= k2. */
  def canonicalPair(df: DataFrame, a: String, b: String): DataFrame =
    df.withColumn("k1", least(col(a), col(b)))
      .withColumn("k2", greatest(col(a), col(b)))

  /** Drop reciprocal duplicates keyed by {a,b} + extraKeys, keeping the
    * first row by `order` (e.g. score desc with deterministic
    * tiebreakers — the A1 sort-then-first pattern). */
  def dedupReciprocal(df: DataFrame, a: String, b: String,
                      extraKeys: Seq[String], order: Seq[Column]): DataFrame = {
    val withPair = canonicalPair(df, a, b)
    val w = Window
      .partitionBy((Seq("k1", "k2") ++ extraKeys).map(col): _*)
      .orderBy(order: _*)
    withPair
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
