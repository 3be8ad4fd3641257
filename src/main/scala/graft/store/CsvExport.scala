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

  /** neo4j-admin bulk-import field-spec header line for `df` (built
    * from the PRE-sanitize schema, so array columns keep their
    * `string[]` spec after the pipe-join). The label/type itself comes
    * from the `--nodes=<label>=` / `--relationships=<type>=` option
    * name, not a column — the partition column is excluded, matching
    * the data files `partitionBy` writes. Data files are HEADERLESS:
    * neo4j-admin treats only the first line of the first matched file
    * as the header, so a shared one-line `header.csv` is written at
    * the export root and listed first in the import call. */
  private[store] def neoHeader(df: DataFrame, partitionCol: String,
                               isEdges: Boolean): String = {
    import org.apache.spark.sql.types._
    df.schema.fields.filterNot(_.name == partitionCol).map { f =>
      f.name match {
        case "id" if !isEdges         => "id:ID"
        case "subject_id" if isEdges  => ":START_ID"
        case "object_id" if isEdges   => ":END_ID"
        case n => f.dataType match {
          case ByteType | ShortType | IntegerType | LongType => s"$n:long"
          case FloatType | DoubleType | _: DecimalType       => s"$n:double"
          case BooleanType                                   => s"$n:boolean"
          // arrays keep their ELEMENT type through the pipe-join
          case ArrayType(ByteType | ShortType | IntegerType | LongType, _) =>
            s"$n:long[]"
          case ArrayType(FloatType | DoubleType | _: DecimalType, _) =>
            s"$n:double[]"
          case ArrayType(BooleanType, _)                     => s"$n:boolean[]"
          case _: ArrayType                                  => s"$n:string[]"
          case _                                             => n
        }
      }
    }.mkString(",")
  }

  private def writeTextFile(conf: org.apache.hadoop.conf.Configuration,
                            dir: String, name: String,
                            content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(conf)
    val os = fs.create(p, true)
    try os.write(content.getBytes("UTF-8")) finally os.close()
  }

  // The writer's quote char must MATCH the import call's --quote="'"
  // (Spark's default '"' would wrap comma-carrying fields in double
  // quotes neo4j-admin then reads as data). Safe as the quote: the
  // sanitize pass maps every ' in values to ^ (F4), so the quote char
  // never occurs inside a field.
  private val QuoteOpts = Map("header" -> "false", "quote" -> "'")

  def writeNodes(nodes: DataFrame, outDir: String): Unit = {
    csvReady(nodes).write.mode("overwrite")
      .partitionBy("label").options(QuoteOpts).csv(outDir)
    writeTextFile(nodes.sparkSession.sparkContext.hadoopConfiguration,
      outDir, "header.csv", neoHeader(nodes, "label", isEdges = false) + "\n")
  }

  def writeEdges(edges: DataFrame, outDir: String): Unit = {
    csvReady(edges).write.mode("overwrite")
      .partitionBy("relation_label").options(QuoteOpts).csv(outDir)
    writeTextFile(edges.sparkSession.sparkContext.hadoopConfiguration,
      outDir, "header.csv", neoHeader(edges, "relation_label", isEdges = true) + "\n")
  }

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
    // each entry lists the shared one-line header file FIRST, then the
    // headerless data parts — neo4j-admin reads the header from the
    // first line of the first matched file only
    nodeLabels.foreach { l =>
      script ++= s"""  --nodes=$l="$nodesDir/header.csv,$nodesDir/label=$l/part-.*\\.csv" \\\n"""
    }
    // the relationship TYPE is the schema's label_as_edge dual
    // (KgSchema, reference schema_config.yaml:146 — BioCypher emits the
    // UPPER_SNAKE type into the import call); the data directory keeps
    // the relation_label name. Undeclared labels pass through verbatim.
    edgeLabels.foreach { l =>
      val neoType = graft.schema.KgSchema.edgeTypes.get(l)
        .flatMap(_.labelAsEdge).getOrElse(l)
      script ++= s"""  --relationships=$neoType="$edgesDir/header.csv,$edgesDir/relation_label=$l/part-.*\\.csv" \\\n"""
    }
    script ++= s"  --overwrite-destination=true\n"
    writeTextFile(conf, nodesDir, "neo4j-admin-import-call.sh", script.toString)
    (nodeLabels, edgeLabels)
  }
}
