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

  /** Undirected co-occurrence pairs via a BOUNDED inverted index:
    * (k1, k2, n_common) for every pair of numeric keys sharing >= 1
    * item, k1 < k2, n_common = the number of shared items. The posting
    * list per item is built with the capped aggregator
    * (BoundedAggs.cappedLongList): an item present in more than
    * `maxDf` keys — the stopword-gram analogue of this family — holds
    * O(maxDf) reducer state, is DETECTED via the exact df counter, and
    * is excluded from the pair universe (logged, never silent; a df-d
    * posting emits d·(d−1)/2 pairs, so one hot item would otherwise go
    * quadratic). Same discipline, same aggregator, same oracle
    * modeling as ngramJaccardPairs. Pairs then explode MAP-SIDE from
    * each posting — no self-join. */
  def coOccurrencePairs(df: DataFrame, itemCol: String, keyCol: String,
                        maxDf: Long, preDistinct: Boolean = false,
                        minCommon: Long = 1L): DataFrame = {
    require(maxDf > 0 && maxDf <= Int.MaxValue - 1, s"maxDf out of range: $maxDf")
    val capAgg = graft.functions.BoundedAggs.cappedLongList(maxDf.toInt)
    val proj = df.select(col(itemCol).as("item"), col(keyCol).cast("long").as("k"))
    // preDistinct: the caller guarantees (item, key) rows are already
    // unique (e.g. it distinct-ed and persisted the projection to also
    // derive dfs/totals from the SAME universe) — skip the second
    // full dedup shuffle.
    val post = (if (preDistinct) proj else proj.distinct())
      .groupBy("item").agg(capAgg(col("k")).as("pl"))
      .filter(col("pl.total") >= 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE pass over the postings yields both guards: the hot-item count
    // and the key range (which decides the packed-key grouping below).
    val g = post.agg(
      sum(when(col("pl.total") > maxDf, 1L).otherwise(0L)).as("nHot"),
      max(array_max(col("pl.items"))).as("maxK"),
      min(array_min(col("pl.items"))).as("minK")).head()
    val nHot = if (g.isNullAt(0)) 0L else g.getLong(0)
    if (nHot > 0)
      println(s"[coOccurrencePairs] excluded $nHot hot items with df > $maxDf")
    // Streaming pair generation (PairExprs.UnorderedPairs): the same
    // (k1, k2) stream the transform/slice/flatten/explode form emitted,
    // without materializing the d·(d−1)/2 pair array (plus slice tail
    // copies) per posting — that materialization, not the aggregation,
    // dominated the dense-posting families' CPU (shares_part: postings
    // of ~10^3 suppliers per canonical part).
    val raw = post.filter(col("pl.total") <= maxDf)
      .select(graft.functions.PairExprs.unorderedPairs(col("pl.items"))
        .as(Seq("k1", "k2")))
    // The pair-count shuffle carries NEARLY-UNIQUE keys (partial
    // aggregation cannot collapse them), so its bytes are the dominant
    // shuffle of every co-occurrence family. When both keys fit 31
    // bits (checked against the actual data above — never assumed),
    // group on ONE packed long instead of two: a third less key bytes
    // and one-word hashing. Bit-identical output either way.
    val packable = !g.isNullAt(1) && !g.isNullAt(2) &&
      g.getLong(2) >= 0L && g.getLong(1) < (1L << 31)
    val counted =
      if (packable)
        raw.select((shiftleft(col("k1"), 32) + col("k2")).as("pk"))
          .groupBy(col("pk"))
          .agg(count(lit(1)).as("n_common"))
          .select(shiftright(col("pk"), 32).as("k1"),
            (col("pk").bitwiseAND(lit(0x7fffffffL))).as("k2"),
            col("n_common"))
      else
        raw.groupBy(col("k1"), col("k2"))
          .agg(count(lit(1)).as("n_common"))
    // minCommon is applied BEFORE the materialization: a caller that
    // only wants pairs sharing >= 2 items (co_purchased / bundle_with)
    // otherwise pays a localCheckpoint copy of the full nearly-unique
    // pair-count table (8M rows at sf0.1) just to filter it to a few
    // thousand rows afterwards.
    val pairs = (if (minCommon > 1L) counted.filter(col("n_common") >= minCommon)
                 else counted)
      .localCheckpoint(true)
    post.unpersist(false)
    pairs
  }
}
