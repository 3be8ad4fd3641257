package graft.triples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Computed edge labels with an aspect whitelist (SURVEY.md F9/O-family):
  * the reference derives GO edge labels from DATA — label =
  * `protein_{qualifier}_{aspect}` where qualifier comes from the
  * annotation row and aspect from the term's namespace, and only
  * whitelisted (qualifier, aspect) combinations are emitted
  * (go_adapter.py:899-907 label synthesis, :1017-1078 aspect pairs).
  *
  * Scale shape: the label is a pure column expression (codegen'd
  * concat); the whitelist is a dimension table broadcast-joined on the
  * (qualifier, aspect) pair — table-driven like the reference's dict,
  * never a fact-side shuffle.
  */
object DerivedLabels {

  /** `{base}_{qualifier}_{aspect}` computed relation label. */
  def derivedLabel(base: String, qualifier: Column, aspect: Column): Column =
    concat_ws("_", lit(base), qualifier, aspect)

  /** Keep only rows whose (qualifier, aspect) pair is whitelisted —
    * broadcast semi-join against the (tiny) pair dimension. */
  def whitelistFilter(df: DataFrame, qCol: String, aCol: String,
                      allowed: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wl = allowed.toDF("__q", "__a")
    df.join(broadcast(wl),
        df(qCol) === col("__q") && df(aCol) === col("__a"), "left_semi")
  }
}
