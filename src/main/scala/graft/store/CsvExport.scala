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

  /** The terminal import-call artifact — the reference's
    * `bc.write_import_call()` (create_crossbar.py:114,201) emits the
    * neo4j-admin invocation for the CSVs it just wrote, configured by
    * biocypher_config.yaml:6-13 (delimiter, array_delimiter '|',
    * quote "'", skip_duplicate_nodes, skip_bad_relationships). This
    * generator enumerates the label directories ACTUALLY present under
    * the export roots (Hadoop FS API, so it works against HDFS/S3 as
    * well as local disk) and writes `neo4j-admin-import-call.sh` next
    * to them. Returns the label sets it found, for callers/specs.
    */
  def writeImportCall(
      spark: org.apache.spark.sql.SparkSession,
      nodesDir: String, edgesDir: String,
      database: String = "neo4j"): (Seq[String], Seq[String]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    def labels(dir: String, prefix: String): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
        .map(_.getPath.getName.stripPrefix(prefix)).sorted
    }
    val nodeLabels = labels(nodesDir, "label=")
    val edgeLabels = labels(edgesDir, "relation_label=")
    val script = new StringBuilder
    script ++= "#!/bin/bash\n"
    script ++= "# generated import call — one --nodes/--relationships entry per\n"
    script ++= "# exported label directory; config mirrors the sink's sanitize rules\n"
    script ++= s"neo4j-admin database import full $database \\\n"
    script ++= "  --delimiter=\",\" --array-delimiter=\"|\" --quote=\"'\" \\\n"
    script ++= "  --skip-duplicate-nodes=true --skip-bad-relationships=true \\\n"
    nodeLabels.foreach { l =>
      script ++= s"""  --nodes=$l="$nodesDir/label=$l/part-.*\\.csv" \\\n"""
    }
    edgeLabels.foreach { l =>
      script ++= s"""  --relationships=$l="$edgesDir/relation_label=$l/part-.*\\.csv" \\\n"""
    }
    script ++= s"  --overwrite-destination=true\n"
    val outPath = new org.apache.hadoop.fs.Path(nodesDir, "neo4j-admin-import-call.sh")
    val fs = outPath.getFileSystem(conf)
    val os = fs.create(outPath, true)
    try os.write(script.toString.getBytes("UTF-8")) finally os.close()
    (nodeLabels, edgeLabels)
  }
}
