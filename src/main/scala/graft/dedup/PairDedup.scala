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
                        maxDf: Long, preDistinct: Boolean = false): DataFrame = {
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
    val nHot = post.filter(col("pl.total") > maxDf).count()
    if (nHot > 0)
      println(s"[coOccurrencePairs] excluded $nHot hot items with df > $maxDf")
    // Streaming pair generation (PairExprs.UnorderedPairs): the same
    // (k1, k2) stream the transform/slice/flatten/explode form emitted,
    // without materializing the d·(d−1)/2 pair array (plus slice tail
    // copies) per posting — that materialization, not the aggregation,
    // dominated the dense-posting families' CPU (shares_part: postings
    // of ~10^3 suppliers per canonical part).
    val pairs = post.filter(col("pl.total") <= maxDf)
      .select(graft.functions.PairExprs.unorderedPairs(col("pl.items"))
        .as(Seq("k1", "k2")))
      .groupBy(col("k1"), col("k2"))
      .agg(count(lit(1)).as("n_common"))
      .localCheckpoint(true)
    post.unpersist(false)
    pairs
  }
}
