package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mention detection + dictionary/alias entity linking (north-rule
  * stage 2). Spark-first formulation: the page side stays a narrow
  * columnar scan; candidate n-grams are generated with codegen'd array
  * expressions (no UDF), and linking is a hash join against a broadcast,
  * rank-resolved dictionary — the distributed analogue of the
  * reference's per-record dict probes (SURVEY.md J5,
  * ppi_adapter.py:478-509).
  *
  * At 100 TB the pages table is the only big side; the dictionary is a
  * dimension and never shuffles the fact table. The explode multiplies
  * rows ~2×tokens but stays within one whole-stage-codegen span until
  * the broadcast join, which is also codegen'd.
  */
object Linker {

  /** Deterministic tokenizer: strip sentence punctuation, split on runs
    * of spaces. Locale-free (no case folding — the dictionary stores
    * surface forms). */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(text, "[.,:;]", "")), " +")

  /** Resolve the alias dictionary to one entity per alias:
    * minimum priority wins; an alias with >1 distinct entity at its
    * minimum priority is AMBIGUOUS and dropped entirely (the reference's
    * multi-mapping drop, ppi_adapter.py:520-529 / SURVEY.md P5). */
  def resolveDict(dict: DataFrame): DataFrame = {
    val minp = dict.groupBy(col("alias").as("a")).agg(min("priority").as("p"))
    dict
      .join(minp, dict("alias") === minp("a") && dict("priority") === minp("p"))
      .groupBy("alias")
      .agg(
        countDistinct("entity_id").as("n"),
        min("entity_id").as("entity_id"),
        min("entity_label").as("entity_label"))
      .filter(col("n") === 1)
      .select(col("alias"), col("entity_id"), col("entity_label"))
  }

  /** Detect unigram + bigram dictionary mentions in `text`.
    * Input: DataFrame with (url, text); dict: (alias, entity_id,
    * entity_label, priority). Output: (url, pos, alias, entity_id,
    * entity_label), one row per occurrence. */
  def mentions(pagesText: DataFrame, dict: DataFrame): DataFrame = {
    val d = broadcast(resolveDict(dict))
    val toks = pagesText
      .select(col("url"), tokens(col("text")).as("toks"))

    val uni = toks.select(
      col("url"), posexplode(col("toks")).as(Seq("pos", "cand")))

    val bi = toks
      .filter(size(col("toks")) >= 2)
      .select(
        col("url"),
        posexplode(
          zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat_ws(" ", a, b))).as(Seq("pos", "cand")))

    uni.unionByName(bi)
      .join(d, col("cand") === d("alias"))
      .select(
        col("url"), col("pos"), col("alias"),
        col("entity_id"), col("entity_label"))
  }
}
