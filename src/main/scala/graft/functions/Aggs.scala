package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's grouped-aggregation vocabulary (SURVEY.md §2.4),
  * re-expressed as window/aggregate built-ins — everything stays inside
  * whole-stage codegen; no UDAFs needed.
  */
object Aggs {

  /** A1: first-per-group after score sort (top-1). Sort keys must end in
    * a deterministic tiebreaker — pandas' drop_duplicates(keep='first')
    * depended on physical row order, which Spark must make explicit
    * (SURVEY.md §7.3 hard-part 1). */
  def top1PerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** A2: set-union of '|'-joined multi-value strings, emitted sorted
    * (the reference's set() iteration order is undefined; sorted output
    * is the deterministic contract). */
  def pipeSetUnionAgg(c: Column): Column =
    concat_ws("|", array_sort(array_distinct(flatten(collect_list(split(c, "\\|"))))))

  /** A4: exact median per group (reference `get_median`,
    * drug_adapter.py:2244-2246: float cast + median + round 3). */
  def medianAgg(c: Column): Column = round(median(c), 3)

  /** A5: middle-row pick — element at ceil(n/2) of the group sorted by
    * `order` (reference get_middle_row, drug_adapter.py:2248-2258; its
    * group order was the earlier sort at :1363-1365, made explicit here).
    * Returns the middle ROW of each group with `outCol` = its value —
    * row_number against the group count, NO per-row list
    * materialization: the old collect_list-over-window form copied the
    * whole group's values into every row's buffer (O(n²) bytes per
    * group — an OOM for one hot group at 10^12 rows); WindowExec's
    * spillable row buffer bounds this form's memory. */
  def middleRow(df: DataFrame, keys: Seq[String], order: Seq[Column],
                valueCol: String, outCol: String): DataFrame = {
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val wAll = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__rn") === ceil(col("__n") / 2.0).cast("int"))
      .withColumn(outCol, col(valueCol))
      .drop("__rn", "__n")
  }

  /** A6: the tf-effect conflict lattice (tfgen_adapter.py:498-513):
    * 'Unknown' yields to any specific value; two distinct specific
    * values conflict → null. Input: collect_set column. */
  def conflictLattice(s: Column, unknown: String = "Unknown"): Column = {
    val specific = array_sort(array_remove(s, unknown))
    when(size(specific) === 1, element_at(specific, 1))
      .when(size(specific) === 0,
        when(array_contains(s, unknown), lit(unknown)).otherwise(lit(null)))
      .otherwise(lit(null))
  }
}
