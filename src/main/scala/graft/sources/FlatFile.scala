package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-line flat-file record parser — the distributed re-expression of
  * the reference's KEGG flat-file state machine (kegg_local.py:211-274,
  * SURVEY.md S6): records are blocks of `KEY  value` lines with
  * continuation lines (leading whitespace), terminated by `///`.
  *
  * Spark-first shape: read the file as one text blob per record via the
  * line-delimiter trick (spark.read.option("lineSep", "///") splits at
  * record boundaries INSIDE the scan, so records never straddle a
  * partition), then a pure column/flatMap parse per record. No driver
  * loops, no state machine across rows.
  */
object FlatFile {

  final case class FlatRecord(fields: Map[String, Seq[String]])

  /** Parse one record body into field -> values (continuation lines
    * append to the last field; pure function, unit-tested). */
  def parseRecord(body: String): Map[String, Seq[String]] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    var current: String = null
    body.split("\n").foreach { line =>
      if (line.nonEmpty && !line.startsWith(" ") && line.exists(!_.isWhitespace)) {
        val key = line.takeWhile(!_.isWhitespace)
        val v = line.drop(key.length).trim
        current = key
        out(key) = out.getOrElse(key, Vector.empty) ++ (if (v.nonEmpty) Vector(v) else Vector.empty)
      } else if (current != null && line.trim.nonEmpty) {
        out(current) = out.getOrElse(current, Vector.empty) :+ line.trim
      }
    }
    out.toMap
  }

  /** Read a flat file into (record_id, field, value) rows. The record
    * id is xxhash64 of the record body — a content key that is stable
    * across reruns and partition layouts (monotonically_increasing_id
    * would renumber records whenever the scan splits differently, so
    * parsed-record lineage would not be reproducible). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val records = spark.read.option("lineSep", "///").text(path)
      .select(trim(col("value")).as("body"))
      .filter(length(col("body")) > 0)
    records.as[String]
      .mapPartitions(_.map(body => (body, parseRecord(body))))
      .toDF("body", "fields")
      .withColumn("record_id", xxhash64(col("body")))
      .select(col("record_id"), explode(col("fields")).as(Seq("field", "vals")))
      .select(col("record_id"), col("field"), explode(col("vals")).as("value"))
  }
}
