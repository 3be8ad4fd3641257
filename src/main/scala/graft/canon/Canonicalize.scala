package graft.canon

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Broadcast-join ID canonicalization with priority fallback
  * (north-rule stage 3b; reference SURVEY.md §1.4, J5 — the dict-probe
  * pattern of ppi_adapter.py:473-509, drug_adapter.py:512-646 and the
  * priority fallback chain of disease_adapter.py:2282-2319).
  *
  * The canonicalization table is a dimension (small vs the fact side),
  * so it is rank-resolved once and broadcast; the fact side never
  * shuffles for this join. Rows with no mapping are dropped, matching
  * the reference's `if not mapped: continue`.
  */
object Canonicalize {

  /** Collapse (raw_id, canonical_id, priority) to the single best mapping
    * per raw_id: lowest priority wins, canonical_id ascending as the
    * deterministic tiebreaker (SURVEY.md §7.3 hard-part 3). */
  def rank1(canon: DataFrame): DataFrame = {
    val w = Window.partitionBy("raw_id").orderBy(col("priority"), col("canonical_id"))
    canon
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("raw_id"), col("canonical_id"))
  }

  /** Replace `idCol` in `df` with its canonical form via an inner
    * broadcast join (unmappable rows dropped). */
  def canonicalize(df: DataFrame, idCol: String, canon: DataFrame): DataFrame = {
    val m = broadcast(rank1(canon))
    df.join(m, df(idCol) === m("raw_id"))
      .drop(idCol, "raw_id")
      .withColumnRenamed("canonical_id", idCol)
  }

  /** Column-expression variant when the mapping is already rank-resolved. */
  def lookup(resolved: DataFrame, idCol: Column): (DataFrame, Column) =
    (broadcast(resolved), idCol)
}
