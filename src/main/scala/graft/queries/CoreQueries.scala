package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.Corpus
import graft.extract.HtmlText
import graft.link.Linker
import graft.triples.Triples

/** Core KG-construction pipeline queries (north-rule stages 1-4), each
  * paired with an ANSI-SQL DuckDB oracle that rebuilds the expected value
  * relationally — so the whole text → mention → link → canonicalize →
  * triple path is verified end-to-end against an independent engine.
  */
object CoreQueries {

  /** Runtime session tuning every query applies (Verify/Bench build the
    * session; these are the runtime-mutable knobs we rely on). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Stage 0: the deterministic corpus itself.
    "q_pages_text" -> ((s, dir) => {
      tune(s)
      Corpus.pageText(s, dir).select("url", "text", "lang")
    }),
    // Stage 1: byte-identical extraction — extractor applied to the html
    // bytes must reproduce the text column; DuckDB rebuilds the text
    // relationally, so any extractor byte drift fails the hash compare.
    "q_extract_text" -> ((s, dir) => {
      tune(s)
      Corpus.pages(s, dir)
        .select(col("url"), HtmlText.htmlText(col("html")).as("text"))
    }),
    // Stage 2a: dictionary rank-1 resolution (priority fallback).
    "q_link_dict" -> ((s, dir) => {
      tune(s)
      Linker.resolveDict(Corpus.aliasDict(s, dir))
    }),
    // Stage 2b: mention detection + linking over the extracted text.
    "q_mentions" -> ((s, dir) => {
      tune(s)
      val pages = Corpus.pages(s, dir)
        .select(col("url"), HtmlText.htmlText(col("html")).as("text"))
      Linker.mentions(pages, Corpus.aliasDict(s, dir))
        .select("url", "alias", "entity_label").distinct()
    }),
    // Stage 4: connected components over the same-name chain graph.
    "q_cc" -> ((s, dir) => {
      tune(s)
      val verts = Corpus.table(s, dir, "part")
        .select(concat(lit("PARTRAW:"), col("p_partkey")).as("v"))
      graft.cc.ConnectedComponents.run(s, Corpus.partSameNameEdges(s, dir), Some(verts))
    }),
    // Stages 1-4 end-to-end: the flagship triple set.
    "q_triples" -> ((s, dir) => {
      tune(s)
      val pages = Corpus.pages(s, dir)
        .select(col("url"), HtmlText.htmlText(col("html")).as("text"))
      val mentions = Linker.mentions(pages, Corpus.aliasDict(s, dir))
      Triples.extract(mentions, Corpus.canonicalIds(s, dir))
    }),
    // §2.5 at pipeline level: canonical-pair dedup of co-mentioned
    // products per page (the ppi reciprocal-dedup pattern applied to
    // web co-occurrence).
    "q_co_ordered" -> ((s, dir) => {
      tune(s)
      val pages = Corpus.pages(s, dir)
        .select(col("url"), HtmlText.htmlText(col("html")).as("text"))
      val mentions = Linker.mentions(pages, Corpus.aliasDict(s, dir))
      val canon = Corpus.canonicalIds(s, dir)
      val prod = graft.canon.Canonicalize.canonicalize(
        mentions.filter(col("entity_label") === "product")
          .select(col("url"), col("entity_id")), "entity_id", canon)
        .select(col("url"), col("entity_id").as("pid")).distinct()
      prod.alias("a").join(prod.alias("b"),
          col("a.url") === col("b.url") && col("a.pid") < col("b.pid"))
        .select(col("a.pid").as("k1"), col("b.pid").as("k2"))
        .distinct()
    }),
    // Node emission (id, label, name) — map props checked rows-only
    // elsewhere; here the flat projection is oracle-checked.
    "q_nodes" -> ((s, dir) => {
      tune(s)
      val pages = Corpus.pages(s, dir)
        .select(col("url"), HtmlText.htmlText(col("html")).as("text"))
      val mentions = Linker.mentions(pages, Corpus.aliasDict(s, dir))
      Triples.nodes(mentions, Corpus.canonicalIds(s, dir))
        .select(col("id"), col("label"), col("props")("name").as("name"))
    })
  )

  /** DuckDB oracle SQL. Table names are the bare parquet stem names.
    * NOTE: component/canonical ids are LEXICOGRAPHIC minima over the
    * 'PARTRAW:<k>' strings (CC runs on string vertex ids), while the
    * linker's rank-1 pick is the NUMERIC-min partkey (priority column is
    * int) — the oracle reproduces both, which is exactly why the
    * broadcast canonicalization stage is observable in q_triples. */
  private val pageTextSql =
    """SELECT 'https://ex.org/' || o.o_orderkey AS url,
      |  'Order ' || o.o_orderkey || ' was placed by ' || c.c_name ||
      |  ' from ' || n.n_name || ' with priority ' || o.o_orderpriority ||
      |  ' on ' || strftime(o.o_orderdate, '%Y-%m-%d') ||
      |  '. Items: ' || coalesce(i.items, 'none') || '.' AS text
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN (
      |  SELECT l.l_orderkey,
      |         string_agg(p.p_name, ', ' ORDER BY l.l_linenumber, p.p_name) AS items
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY l.l_orderkey) i ON i.l_orderkey = o.o_orderkey""".stripMargin

  private val mentionsSql =
    """WITH pages AS (SELECT o_orderkey, 'https://ex.org/' || o_orderkey AS url, o_custkey FROM orders)
      |SELECT DISTINCT pg.url, c.c_name AS alias, 'customer' AS entity_label
      |FROM pages pg JOIN customer c ON pg.o_custkey = c.c_custkey
      |UNION
      |SELECT DISTINCT pg.url, n.n_name, 'nation'
      |FROM pages pg JOIN customer c ON pg.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |UNION
      |SELECT DISTINCT pg.url, p.p_name, 'product'
      |FROM pages pg JOIN lineitem l ON l.l_orderkey = pg.o_orderkey
      |JOIN part p ON p.p_partkey = l.l_partkey""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_pages_text" -> (pageTextSql.replace("AS text", "AS text, 'en' AS lang")),
    "q_extract_text" -> pageTextSql,
    "q_link_dict" ->
      """SELECT p_name AS alias, 'PARTRAW:' || min(p_partkey) AS entity_id,
        |       'product' AS entity_label
        |FROM part GROUP BY p_name
        |UNION ALL
        |SELECT c_name, 'CUST:' || c_custkey, 'customer' FROM customer
        |UNION ALL
        |SELECT n_name, 'NATION:' || n_nationkey, 'nation' FROM nation""".stripMargin,
    "q_mentions" -> mentionsSql,
    "q_cc" ->
      """SELECT 'PARTRAW:' || p_partkey AS member,
        |       min('PARTRAW:' || p_partkey) OVER (PARTITION BY p_name) AS component
        |FROM part""".stripMargin,
    "q_triples" ->
      """WITH pc AS (
        |  SELECT p_partkey,
        |         'PART:' || replace(min('PARTRAW:' || p_partkey) OVER (PARTITION BY p_name), 'PARTRAW:', '') AS pid
        |  FROM part)
        |SELECT DISTINCT 'CUST:' || o.o_custkey AS subject_id,
        |       'ordered' AS relation_label, pc.pid AS object_id
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN pc ON pc.p_partkey = l.l_partkey
        |UNION
        |SELECT DISTINCT 'CUST:' || c.c_custkey, 'located_in', 'NATION:' || c.c_nationkey
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey""".stripMargin,
    "q_co_ordered" ->
      """WITH pc AS (
        |  SELECT p_partkey,
        |         'PART:' || replace(min('PARTRAW:' || p_partkey) OVER (PARTITION BY p_name), 'PARTRAW:', '') AS pid
        |  FROM part),
        |op AS (
        |  SELECT DISTINCT l.l_orderkey, pc.pid
        |  FROM lineitem l JOIN pc ON pc.p_partkey = l.l_partkey)
        |SELECT DISTINCT a.pid k1, b.pid k2
        |FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.pid < b.pid""".stripMargin,
    "q_nodes" ->
      """WITH pc AS (
        |  SELECT p_name, 'PART:' || replace(min('PARTRAW:' || p_partkey), 'PARTRAW:', '') AS pid,
        |         min(p_partkey) AS minkey
        |  FROM part GROUP BY p_name),
        |mentioned_parts AS (
        |  SELECT DISTINCT p.p_name FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |mentioned_custs AS (SELECT DISTINCT o_custkey FROM orders)
        |SELECT pc.pid AS id, 'product' AS label, mp.p_name AS name
        |FROM mentioned_parts mp JOIN pc ON pc.p_name = mp.p_name
        |UNION
        |SELECT 'CUST:' || c.c_custkey, 'customer', c.c_name
        |FROM customer c JOIN mentioned_custs m ON m.o_custkey = c.c_custkey
        |UNION
        |SELECT DISTINCT 'NATION:' || n.n_nationkey, 'nation', n.n_name
        |FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        |JOIN mentioned_custs m ON m.o_custkey = c.c_custkey""".stripMargin
  )
}
