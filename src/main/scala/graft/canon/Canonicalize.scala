package graft.canon

import org.apache.spark.sql.DataFrame
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

  /** Taxon-checked canonicalization (the reference's organism-guarded
    * map probe, ppi_adapter.py:478-509: a symbol resolves only when the
    * mapping row's organism equals the record's organism). The mapping
    * table carries (raw_id, taxon, canonical_id, priority); rank-1 is
    * resolved PER (raw_id, taxon), and the broadcast join adds the taxon
    * equality to the key — a symbol shared across organisms maps to the
    * right entity per row, and rows whose (id, taxon) pair has no
    * mapping are dropped exactly like the unguarded variant. */
  def canonicalizeTaxon(df: DataFrame, idCol: String, taxCol: String,
                        canon: DataFrame): DataFrame = {
    val w = Window.partitionBy("raw_id", "taxon")
      .orderBy(col("priority"), col("canonical_id"))
    val m = broadcast(
      canon.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("raw_id").as("__raw"), col("taxon").as("__tax"),
          col("canonical_id")))
    df.join(m, df(idCol) === col("__raw") && df(taxCol) === col("__tax"))
      .drop(idCol).drop("__raw").drop("__tax")
      .withColumnRenamed("canonical_id", idCol)
  }
}
