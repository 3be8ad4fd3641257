package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.HtmlText
import graft.fixtures.Corpus
import graft.link.Linker
import graft.store.GraphStore
import graft.triples.Triples

/** The end-to-end KG-construction pipeline (north rule):
  * Page table → (1) deterministic text extraction with xxhash64 per-row
  * audit → (2) mention detection + broadcast-dictionary linking →
  * (3) triple extraction + broadcast canonicalization → (4) connected-
  * components canonical-id resolution → partitioned graph store (nodes
  * bucketed by id hash, edges by subject hash), every stage committed
  * as a resumable snapshot with per-partition lineage.
  *
  * Scale posture: pages are explicitly repartitioned by xxhash64(url)
  * so downstream per-page work (extract, n-gram explode, co-mention
  * join) is uniformly spread and the same partitioning is reused until
  * the triple distinct; the only big shuffles are that distinct and the
  * CC rounds (both AQE-managed).
  */
object Pipeline {

  final case class Result(
      nPages: Long, nTriples: Long, nNodes: Long,
      auditMismatches: Long, seconds: Double, triplesPerSec: Double,
      pagesPerSec: Double)

  /** Deterministic corpus amplification for scaling runs: `mult`
    * replicas per page with distinct urls (identical text — the triple
    * set stays the base set after distinct, but every per-page stage
    * does mult× the work, which is what a 10^12-document corpus looks
    * like relative to its dictionary). */
  private def amplify(pages: org.apache.spark.sql.DataFrame, mult: Int) =
    if (mult <= 1) pages
    else pages
      .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
      .select(
        concat(col("url"), lit("#"), col("rep")).as("url"),
        col("warc_ts"), col("html"), col("text"), col("lang"))

  def run(spark: SparkSession, sfDir: String, storeBase: String,
          partitions: Int, mult: Int = 1): Result = {
    val t0 = System.nanoTime()
    var tLast = t0
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    var cpuLast = osBean.getProcessCpuTime
    def mark(stage: String): Unit = {
      val now = System.nanoTime()
      val cpuNow = osBean.getProcessCpuTime
      println(f"[pipeline] $stage wall=${(now - tLast) / 1e9}%.1fs cpu=${(cpuNow - cpuLast) / 1e9}%.1fs")
      tLast = now
      cpuLast = cpuNow
    }

    // Per-stage input fingerprints: a changed corpus or parameterization
    // invalidates downstream committed snapshots on resume (the manifest
    // records the fp; GraphStore recomputes on mismatch).
    val fpCorpus = s"corpus;sfDir=$sfDir;mult=$mult"
    val fpExtract = s"extract-v2;$fpCorpus"
    val fpMentions = s"mentions-trie-v2;$fpExtract;dict=aliasDict"
    val fpCanon = s"canon-cc-v1;sfDir=$sfDir"
    val fpTriples = s"triples-v1;$fpMentions;$fpCanon"
    val fpNodes = s"nodes-typed-v4;$fpMentions;$fpCanon;attrs=nodeAttrs;" +
      "+order+doc+ptype+user+evt+lang+src"
    val fpEdges = s"edges-fused-v4;$fpMentions;$fpCanon;" +
      "src=web+ledger+placed+contains+oftype+performed+writtenin+fromsource+fulfills"

    // Stage-commit pipelining: independent stages run as concurrent
    // Spark jobs (the scheduler interleaves their tasks), and each
    // commit's lineage read-back + manifest land asynchronously off the
    // critical path (GraphStore.awaitPending at the end; a kill leaves
    // manifest-less corpses that resume recomputes — same guarantee).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    // Stage 3/4 input: the CC-derived canonicalization table depends
    // only on the source tables — overlap it with extract+mentions.
    val canonF = Future {
      GraphStore.getOrCompute(spark, storeBase, "canonical_ids",
        inputFp = fpCanon, lineageAsync = true) {
        Corpus.canonicalIds(spark, sfDir)
      }
    }

    // Stage 1: extract (+ per-row audit vs the reference text column).
    // Explicit url-hash repartition happens BEFORE amplification: the
    // shuffle moves only the base corpus (replicas explode map-side in
    // place, 16× less shuffled bytes at mult=16) and per-page work stays
    // uniformly spread because replicas of a page are interchangeable.
    val extracted = GraphStore.getOrCompute(spark, storeBase, "extracted",
        inputFp = fpExtract, lineageAsync = true) {
      amplify(Corpus.pages(spark, sfDir)
          .repartition(partitions, xxhash64(col("url"))), mult)
        .select(
          col("url"), col("warc_ts"), col("lang"),
          HtmlText.htmlText(col("html")).as("text"),
          xxhash64(col("text")).as("ref_hash"))
        .withColumn("text_hash", xxhash64(col("text")))
    }
    mark("extract")
    // Audit gates the mentions stage: a corrupt extraction must fail
    // BEFORE a downstream snapshot derived from it can be committed and
    // resumed (the audit is a two-int64-column scan of the committed
    // parquet — cheap relative to the stage it guards).
    val audit = extracted.filter(col("text_hash") =!= col("ref_hash")).count()
    require(audit == 0, s"byte-identity audit failed on $audit pages")

    // Stage 2: mentions (broadcast trie; fact side never shuffles).
    val mentions = GraphStore.getOrCompute(spark, storeBase, "mentions",
        inputFp = fpMentions, lineageAsync = true) {
      Linker.mentions(extracted.select("url", "text"), Corpus.aliasDict(spark, sfDir))
    }
    mark("mentions")
    val canon = Await.result(canonF, Duration.Inf)
    mark("canon_cc")

    // Shared intermediate: per-page canonical entity sets — computed
    // (scan + group of the big mentions table) ONCE, consumed by both
    // the triple and the evidence/edge stages.
    val pageSets = GraphStore.getOrCompute(spark, storeBase, "pagesets",
        inputFp = s"pagesets-v1;$fpMentions;$fpCanon", lineageAsync = true) {
      Triples.perPageEntitySets(mentions, canon)
    }
    // Triples is a reporting artifact (edges re-derive with evidence),
    // so it runs concurrently with the nodes stage.
    val triplesF = Future {
      GraphStore.getOrCompute(spark, storeBase, "triples",
        inputFp = fpTriples, lineageAsync = true) {
        Triples.extractFromSets(pageSets, canon)
      }
    }
    // Typed nodes (golden schema: props, props_arr, embedding), written
    // directory-partitioned by id-hash bucket so downstream readers
    // prune. Order nodes join the graph here with their int/float/bool
    // props (round(_,3) float, commaInt-parsed int, bool) — the typed-
    // coercion vocabulary runs inside the flagship path, not just in
    // golden unit tests.
    val nodes = GraphStore.getOrCompute(spark, storeBase, "nodes",
        partitionByCols = Seq("bucket"), inputFp = fpNodes, lineageAsync = true) {
      // Multi-adapter node merge (reference: one adapter per source —
      // uniprot/drug/go/... — all landing in one typed node table):
      // web-corpus entities + order ledger + document metadata + event
      // stream + part/type vocabularies, every family schema-declared
      // in KgSchema and conformance-checked by the same violations
      // machinery.
      val plain = Seq(
        Corpus.orderNodes(spark, sfDir),
        Corpus.documentNodes(spark, sfDir),
        Corpus.ptypeNodes(spark, sfDir),
        Corpus.userNodes(spark, sfDir),
        Corpus.eventTypeNodes(spark, sfDir),
        Corpus.languageNodes(spark, sfDir),
        Corpus.sourceNodes(spark, sfDir))
        .map(_.withColumn("props_arr", map().cast("map<string,array<string>>"))
          .withColumn("embedding", lit(null).cast("array<float>")))
        .reduce(_ unionByName _)
      Triples.nodesTyped(Triples.nodes(mentions, canon), Corpus.nodeAttrs(spark, sfDir))
        .unionByName(plain)
        .withColumn("bucket", pmod(xxhash64(col("id")), lit(32)))
    }
    mark("nodes")
    // Edges: multi-source fusion (web co-mentions + order ledger —
    // sources/evidence set-union, reference ppi_adapter.py:1268-1303),
    // then skip-bad-relationships at the sink (reference
    // biocypher_config skip_bad_relationships) = endpoints must exist.
    val edges = GraphStore.getOrCompute(spark, storeBase, "edges",
        partitionByCols = Seq("bucket"), inputFp = fpEdges, lineageAsync = true) {
      import graft.merge.MergeSources
      val fused = MergeSources.mergeAll(
        Seq(Triples.evidenceFromSets(pageSets, canon),
          Corpus.ledgerEdges(spark, sfDir, canon)),
        keys = Seq("subject_id", "relation_label", "object_id"),
        rules = Seq(
          MergeSources.PipeSetUnion("sources"),
          MergeSources.PipeSetUnion("evidence")))
        .withColumn("properties", map(
          lit("sources"), col("sources"),
          lit("evidence"), col("evidence"),
          lit("n_pages"), coalesce(col("n_pages"), lit(0L)).cast("string"),
          lit("n_lines"), coalesce(col("n_lines"), lit(0L)).cast("string")))
        .select(col("subject_id"), col("relation_label"), col("object_id"),
          col("properties"))
      // Relational typed-edge layers (placed: int year; contains: int
      // quantity + round(_,3) float extendedprice) ride the same sink
      // schema; skip-bad-relationships applies to every family.
      val placed = Corpus.placedEdges(spark, sfDir)
        .select(col("subject_id"), col("relation_label"), col("object_id"),
          map(lit("year"), col("year").cast("string")).as("properties"))
      val contains = Corpus.containsEdges(spark, sfDir, canon)
        .select(col("subject_id"), col("relation_label"), col("object_id"),
          map(lit("quantity"), col("quantity").cast("string"),
            lit("extendedprice"), col("extendedprice").cast("string"))
            .as("properties"))
      // Breadth families (round 3): vocabulary/metadata/event-stream
      // edges, each with its typed props riding the uniform sink schema.
      val ofType = Corpus.ofTypeEdges(spark, sfDir)
        .withColumn("properties", map().cast("map<string,string>"))
      val performed = Corpus.performedEdges(spark, sfDir)
        .select(col("subject_id"), col("relation_label"), col("object_id"),
          map(lit("n_events"), col("n_events").cast("string"),
            lit("value_milli"), col("value_milli").cast("string"))
            .as("properties"))
      val writtenIn = Corpus.writtenInEdges(spark, sfDir)
        .withColumn("properties", map().cast("map<string,string>"))
      val fromSource = Corpus.fromSourceEdges(spark, sfDir)
        .withColumn("properties", map().cast("map<string,string>"))
      val fulfills = Corpus.fulfillsEdges(spark, sfDir)
        .select(col("subject_id"), col("relation_label"), col("object_id"),
          map(lit("n_lines"), col("n_lines").cast("string"),
            lit("qty_milli"), col("qty_milli").cast("string"))
            .as("properties"))
      val ids = nodes.select(col("id"))
      Seq(fused, placed, contains, ofType, performed, writtenIn,
          fromSource, fulfills)
        .reduce(_ unionByName _)
        .join(ids.withColumnRenamed("id", "subject_id"), Seq("subject_id"), "left_semi")
        .join(ids.withColumnRenamed("id", "object_id"), Seq("object_id"), "left_semi")
        .withColumn("bucket", pmod(xxhash64(col("subject_id")), lit(32)))
    }
    mark("edges")

    Await.result(triplesF, Duration.Inf)
    val nTriples = edges.count()
    val nNodes = nodes.count()
    val nPages = extracted.count()
    GraphStore.awaitPending()
    mark("finalize")
    val secs = (System.nanoTime() - t0) / 1e9
    Result(nPages, nTriples, nNodes, audit, secs, nTriples / secs, nPages / secs)
  }
}
