package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.schema.KgSchema
import graft.sources.FlatFile
import graft.store.CsvExport
import graft.functions.StringFns

class SchemaSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("schema conformance: pipeline node/edge output conforms to the declared KG schema") {
    val mentions = graft.link.Linker.mentions(
      graft.fixtures.Corpus.pages(spark, TestSpark.sf0001).select("url", "text"),
      graft.fixtures.Corpus.aliasDict(spark, TestSpark.sf0001))
    val canon = graft.fixtures.Corpus.canonicalIds(spark, TestSpark.sf0001)
    val nodes = graft.triples.Triples.nodes(mentions, canon)
    val edges = graft.triples.Triples.extract(mentions, canon)
      .withColumn("properties", map(lit("source"), lit("web")))
    assert(KgSchema.nodeViolations(nodes).isEmpty)
    assert(KgSchema.edgeViolations(edges).isEmpty)
  }

  test("schema conformance: violations are detected") {
    val bad = Seq(("XX:1", "customer", Map("name" -> "x"))).toDF("id", "label", "props")
    assert(!KgSchema.nodeViolations(bad).isEmpty)
    val badEdge = Seq(("CUST:1", "ordered", "NATION:2", Map("source" -> "web")))
      .toDF("subject_id", "relation_label", "object_id", "properties")
    assert(!KgSchema.edgeViolations(badEdge).isEmpty) // ordered must target product
  }

  test("skip_bad_relationships drops edges with unknown endpoints") {
    val nodes = Seq(("CUST:1", "customer"), ("PART:2", "product")).toDF("id", "label")
    val edges = Seq(
      ("CUST:1", "ordered", "PART:2"),
      ("CUST:1", "ordered", "PART:99")).toDF("subject_id", "relation_label", "object_id")
    val kept = KgSchema.dropBadRelationships(edges, nodes)
    assert(kept.count() == 1)
  }

  test("flat-file parser: records, continuations, record separator (S6)") {
    val body =
      """ENTRY       D00001
        |NAME        Drug A
        |DBLINKS     CAS: 50-00-0
        |            PubChem: 12345
        |///
        |ENTRY       D00002
        |NAME        Drug B
        |///""".stripMargin
    val dir = Files.createTempDirectory("ff_")
    Files.writeString(dir.resolve("data.txt"), body)
    val df = FlatFile.read(spark, dir.toString)
    val rows = df.as[(Long, String, String)].collect()
    assert(rows.count(_._2 == "ENTRY") == 2)
    val d1Links = rows.filter(r => r._2 == "DBLINKS").map(_._3).toSet
    assert(d1Links == Set("CAS: 50-00-0", "PubChem: 12345"))
    // record ids are content keys: a second read (different partition
    // layout) assigns the SAME ids — lineage is reproducible
    val again = FlatFile.read(spark, dir.toString).as[(Long, String, String)]
      .collect().toSet
    assert(again == rows.toSet)
    assert(rows.map(_._1).distinct.length == 2)
  }

  test("flat-file parseRecord pure-function golden") {
    val m = FlatFile.parseRecord("KEY1  v1\nKEY2  a\n      b\nKEY1  v2")
    assert(m("KEY1") == Vector("v1", "v2"))
    assert(m("KEY2") == Vector("a", "b"))
  }

  test("csv export: per-label dirs, sanitized strings, pipe-joined arrays/maps (S11/F4/F8)") {
    val nodes = Seq(
      ("CUST:1", "customer", Map("name" -> "o'brien|x"), Seq("a", "b"),
        Seq(1.5, 2.5))
    ).toDF("id", "label", "props", "tags", "scores")
    val out = Files.createTempDirectory("csv_").toString
    CsvExport.writeNodes(nodes, out)
    val labelDirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("label="))
    assert(labelDirs.toSet == Set("label=customer"))
    // data files are HEADERLESS (neo4j-admin bulk-import layout); the
    // one-line header.csv at the root carries the field specs — note
    // the numeric array keeps its element type (double[], not string[])
    val header = new String(Files.readAllBytes(
      java.nio.file.Paths.get(out, "header.csv")), "UTF-8").trim
    assert(header == "id:ID,props,tags:string[],scores:double[]")
    val back = spark.read.option("quote", "'").csv(out + "/label=customer")
      .toDF("id", "props", "tags", "scores")
    val row = back.head()
    assert(row.getAs[String]("props") == "name:o^brien,x") // sanitize applied to map values
    assert(row.getAs[String]("tags") == "a|b")
    assert(row.getAs[String]("scores") == "1.5|2.5")
  }

  test("import-call artifact enumerates exactly the written labels (S10, write_import_call)") {
    val nodes = Seq(
      ("CUST:1", "customer", "acme"),
      ("PART:1", "product", "widget")).toDF("id", "label", "name")
    val edges = Seq(
      ("CUST:1", "ordered", "PART:1"),
      ("PART:1", "similar_to", "PART:1")).toDF("subject_id", "relation_label", "object_id")
    val nOut = Files.createTempDirectory("csv_n_").toString
    val eOut = Files.createTempDirectory("csv_e_").toString
    CsvExport.writeNodes(nodes, nOut)
    CsvExport.writeEdges(edges, eOut)
    val (nl, el) = CsvExport.writeImportCall(spark, nOut, eOut)
    assert(nl == Seq("customer", "product"))
    assert(el == Seq("ordered", "similar_to"))
    val script = new String(Files.readAllBytes(
      java.nio.file.Paths.get(nOut, "neo4j-admin-import-call.sh")), "UTF-8")
    // exactly one --nodes / --relationships entry per written label, no extras
    assert("--nodes=".r.findAllIn(script).size == 2)
    assert("--relationships=".r.findAllIn(script).size == 2)
    for (l <- nl) assert(script.contains(s"--nodes=$l="))
    // the relationship TYPE is the schema's label_as_edge dual
    // (ORDERED is the uppercase default; similar_to carries an
    // explicit non-default mapping) — the data path keeps the
    // relation_label directory name
    assert(script.contains("--relationships=ORDERED="))
    assert(script.contains("--relationships=IS_SIMILAR_TO="))
    assert(script.contains("relation_label=similar_to/part-"))
    assert(script.contains("--array-delimiter=\"|\"") && script.contains("--quote=\"'\""))
    assert(script.contains("--skip-duplicate-nodes=true")
      && script.contains("--skip-bad-relationships=true"))
    // every entry lists the shared header file first, then the
    // headerless parts — the layout neo4j-admin actually imports
    assert(script.contains(s"""--nodes=customer="$nOut/header.csv,$nOut/label=customer/part-.*\\.csv""""))
    assert(script.contains(s"""--relationships=ORDERED="$eOut/header.csv,$eOut/relation_label=ordered/part-.*\\.csv""""))
    val nHeader = new String(Files.readAllBytes(
      java.nio.file.Paths.get(nOut, "header.csv")), "UTF-8").trim
    val eHeader = new String(Files.readAllBytes(
      java.nio.file.Paths.get(eOut, "header.csv")), "UTF-8").trim
    assert(nHeader == "id:ID,name")
    assert(eHeader == ":START_ID,:END_ID")
  }

  test("P6 pattern null-out golden") {
    val r = Seq(("12345", "unassigned1303")).toDF("a", "b")
      .select(StringFns.nullOutIfContains($"a", "unassigned"),
        StringFns.nullOutIfContains($"b", "unassigned")).head()
    assert(r.getString(0) == "12345" && r.isNullAt(1))
  }

  test("S3: column-pruned delimited scan with broadcast semi-join filter") {
    // GAF-like TSV: 17 cols, keep 5, semi-join against an allow-list.
    val dir = Files.createTempDirectory("gaf_")
    val lines = (0 until 100).map { i =>
      (0 until 17).map(c => s"c${c}_$i").mkString("\t")
    }
    Files.writeString(dir.resolve("x.tsv"), lines.mkString("\n"))
    val schema = org.apache.spark.sql.types.StructType(
      (0 until 17).map(i => org.apache.spark.sql.types.StructField(
        s"col$i", org.apache.spark.sql.types.StringType)))
    val gaf = spark.read.option("sep", "\t").schema(schema).csv(dir.toString)
      .select("col1", "col4", "col6", "col8", "col10")
    val allow = Seq("c1_5", "c1_7").toDF("entry")
    val kept = gaf.join(broadcast(allow), gaf("col1") === allow("entry"), "left_semi")
    assert(kept.count() == 2)
    // column pruning reaches the scan
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") || !plan.contains("col16"),
      "scan should not read unprojected columns")
  }
}
