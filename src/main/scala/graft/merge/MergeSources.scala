package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic multi-source edge merging: the reference's signature operator
  * (SURVEY.md J1/J2 — ppi_adapter.py:802-1254 `merge_all`,
  * drug_adapter.py:1695-1969 `merge_all_dtis`): an ordered fold of
  * full-outer equi-joins on the pair key, fusing the duplicated columns
  * after each step. One declarative helper replaces the reference's
  * ~450 copied lines per pipeline.
  *
  * Fuse rules (SURVEY.md A2/A3):
  *   - FirstNonNull: scalar columns — left wins (source order = priority
  *     order, mirroring the reference's first-non-null,
  *     ppi_adapter.py:971-987)
  *   - PipeSetUnion: '|'-joined multi-value strings — set-union, sorted
  *     for cross-partition determinism (SURVEY.md §7.3 hard-part 3)
  *   - OrderedConcat: '|'-joined, first-seen order preserved by source
  *     fold order (array_distinct keeps first occurrence)
  *
  * Scale: each fold step is one shuffle on the pair key; all sources
  * share that key, so with AQE the shuffles chain without re-partition.
  * At 100 TB you'd bucket all per-source tables by the pair key at write
  * time and the fold becomes shuffle-free sort-merge joins.
  */
object MergeSources {

  sealed trait FuseRule { def col: String }
  final case class FirstNonNull(col: String) extends FuseRule
  final case class PipeSetUnion(col: String) extends FuseRule
  final case class OrderedConcat(col: String) extends FuseRule

  private def fuse(rule: FuseRule, l: Column, r: Column): Column = rule match {
    case FirstNonNull(_) => coalesce(l, r)
    case PipeSetUnion(_) =>
      // empty union -> null (the reference's NaN), not empty string
      val u = array_distinct(concat(
        coalesce(split(l, "\\|"), array()),
        coalesce(split(r, "\\|"), array())))
      when(size(u) === 0, lit(null)).otherwise(concat_ws("|", array_sort(u)))
    case OrderedConcat(_) =>
      concat_ws("|", array_distinct(concat(
        coalesce(split(l, "\\|"), array()),
        coalesce(split(r, "\\|"), array()))))
  }

  /** Full-outer merge of two per-source DataFrames on `keys`.
    * Columns named in `rules` are fused; any other non-key column is
    * passed through from whichever side has it (error if both do and no
    * rule covers it). */
  def merge(left: DataFrame, right: DataFrame, keys: Seq[String],
            rules: Seq[FuseRule]): DataFrame = {
    val ruleMap = rules.map(r => r.col -> r).toMap
    val l = left.alias("l")
    val r = right.alias("r")
    val cond = keys.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _)
    val joined = l.join(r, cond, "full_outer")

    val keyCols = keys.map(k => coalesce(col(s"l.$k"), col(s"r.$k")).as(k))
    val lOnly = left.columns.filterNot(keys.contains).toSeq
    val rOnly = right.columns.filterNot(keys.contains).toSeq
    val shared = lOnly.toSet.intersect(rOnly.toSet)
    require(shared.subsetOf(ruleMap.keySet),
      s"shared non-key columns need a fuse rule: ${shared -- ruleMap.keySet}")

    val valCols: Seq[Column] =
      (lOnly ++ rOnly.filterNot(lOnly.contains)).map { c =>
        if (shared.contains(c)) fuse(ruleMap(c), col(s"l.$c"), col(s"r.$c")).as(c)
        else if (lOnly.contains(c)) col(s"l.$c").as(c)
        else col(s"r.$c").as(c)
      }
    joined.select(keyCols ++ valCols: _*)
  }

  /** Ordered fold over per-source DataFrames (the merge_all chain). */
  def mergeAll(sources: Seq[DataFrame], keys: Seq[String],
               rules: Seq[FuseRule]): DataFrame =
    sources.reduceLeft((a, b) => merge(a, b, keys, rules))

  /** Row-wise median across per-source numeric columns, nulls ignored
    * (the reference's get_median over the merged row's per-source score
    * values — drug_adapter.py:2244-2246: float cast + median + round 3;
    * pandas median = mean of the two middle values for even counts).
    * Used AFTER an n-way fold that kept each source's score column
    * (the reference's _x/_y suffixes): a pairwise fuse rule cannot
    * express a 6-source median, the row-wise form can. Null when every
    * source is absent. */
  def rowMedian(cols: Seq[Column]): Column = {
    val arr = array_sort(filter(array(cols.map(_.cast("double")): _*),
      x => x.isNotNull))
    val n = size(arr)
    when(n === 0, lit(null)).otherwise(
      round((element_at(arr, ((n + 1) / 2).cast("int")) +
        element_at(arr, (n / 2 + 1).cast("int"))) / 2.0, 3))
  }

  /** Row-wise middle value (element ceil(n/2) of the sorted non-null
    * per-source values — the reference's get_middle_row applied across
    * the merged row, drug_adapter.py:2248-2258). */
  def rowMiddle(cols: Seq[Column]): Column = {
    val arr = array_sort(filter(array(cols: _*), x => x.isNotNull))
    val n = size(arr)
    when(n === 0, lit(null))
      .otherwise(element_at(arr, ceil(n / 2.0).cast("int")))
  }

  /** Count of sources contributing a non-null value on this row. */
  def rowSourceCount(cols: Seq[Column]): Column =
    size(filter(array(cols: _*), x => x.isNotNull))
}
