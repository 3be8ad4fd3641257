package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StringFns

/** Per-label CSV export — the reference's `export_csv` path
  * (uniprot_adapter.py:1062-1115, every adapter's export block,
  * SURVEY.md S11) and its Neo4j-oriented sanitization (F4: '|'→',',
  * "'"→'^'; F8: arrays pipe-joined). Parquet keeps raw values; the CSV
  * sink applies the lossy cleanup exactly like the reference did.
  *
  * `partitionBy(label)` gives one directory per label — the distributed
  * equivalent of the reference's one-CSV-per-label loop.
  */
object CsvExport {

  /** Sanitize every string column, pipe-join every array column. */
  def csvReady(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.StringType =>
          acc.withColumn(f.name, StringFns.sanitize(col(f.name)))
        case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, _) =>
          acc.withColumn(f.name,
            concat_ws("|", transform(col(f.name), x => StringFns.sanitize(x))))
        case _: org.apache.spark.sql.types.ArrayType =>
          acc.withColumn(f.name, concat_ws("|", col(f.name)))
        case _: org.apache.spark.sql.types.MapType =>
          // sanitize VALUES before pipe-joining (reference order: clean,
          // then array_delimiter join — biocypher_config.yaml:7-9)
          acc.withColumn(f.name,
            concat_ws("|", transform(map_entries(col(f.name)),
              e => concat_ws(":", e.getField("key"),
                StringFns.sanitize(e.getField("value").cast("string"))))))
        case _ => acc
      }
    }

  def writeNodes(nodes: DataFrame, outDir: String): Unit =
    csvReady(nodes).write.mode("overwrite")
      .partitionBy("label").option("header", "true").csv(outDir)

  def writeEdges(edges: DataFrame, outDir: String): Unit =
    csvReady(edges).write.mode("overwrite")
      .partitionBy("relation_label").option("header", "true").csv(outDir)
}
