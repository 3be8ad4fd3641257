package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BoundedAggs, Salted}
import graft.store.BucketedGraph
import graft.triples.Triples

/** The two at-scale layout/skew techniques the north-star names
  * explicitly: bucketed co-located graph tables (no Exchange on
  * bucket-key joins) and salted aggregation for hub keys (bit-identical
  * results, fan-in spread over salts reducers).
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed nodes/edges join on the bucket key plans NO shuffle on either side") {
    val triples = SparkEntry.queries("q_triples")(spark, TestSpark.sf0001)
    val nodes = triples.select(col("subject_id").as("id")).distinct()
      .withColumn("label", lit("entity"))
    BucketedGraph.write(nodes, triples, "spec_bg", nBuckets = 8)
    try {
      val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = BucketedGraph.edgesWithSubjects(spark, "spec_bg")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle, plan was:\n$plan")
        // same rows as the plain (shuffled) join over the raw frames
        val expected = triples.join(
          nodes, triples("subject_id") === nodes("id")).count()
        assert(joined.count() === expected)

        // groupBy on the bucket key: no shuffle either
        val deg = BucketedGraph.subjectDegrees(spark, "spec_bg")
        val degPlan = deg.queryExecution.executedPlan.toString
        assert(!degPlan.contains("Exchange"),
          s"bucket-key aggregation must not shuffle, plan was:\n$degPlan")
        assert(deg.count() === nodes.count())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_bg_nodes")
      spark.sql("DROP TABLE IF EXISTS spec_bg_edges")
    }
  }

  test("forward+reverse adjacency: 2-hop traversal plans NO Exchange on either scan") {
    // succession chains (ORDER -> ORDER) so k-hop paths actually exist
    val chain = graft.fixtures.Corpus.nextOrderEdges(spark, TestSpark.sf0001)
      .select("subject_id", "relation_label", "object_id")
    val nodes = chain.select(col("subject_id").as("id"))
      .unionByName(chain.select(col("object_id").as("id"))).distinct()
      .withColumn("label", lit("entity"))
    BucketedGraph.write(nodes, chain, "spec_2hop", nBuckets = 8)
    BucketedGraph.writeReverse(chain, "spec_2hop", nBuckets = 8)
    try {
      val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val hops = BucketedGraph.twoHop(spark, "spec_2hop")
        val plan = hops.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucket-on-bucket 2-hop must not shuffle, plan was:\n$plan")
        // same rows as the plain self-join over the raw edge frame
        val a = chain.select(col("subject_id").as("a"),
          col("relation_label").as("rel1"), col("object_id"))
        val b = chain.select(col("subject_id"),
          col("relation_label").as("rel2"), col("object_id").as("c"))
        val expected = a.join(b, a("object_id") === b("subject_id")).count()
        assert(hops.count() === expected && expected > 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_2hop_nodes")
      spark.sql("DROP TABLE IF EXISTS spec_2hop_edges")
      spark.sql("DROP TABLE IF EXISTS spec_2hop_edges_rev")
    }
  }

  test("IVF inverted lists written cid-partitioned are read with partition pruning") {
    val emb = spark.read
      .parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_lists_").toString
    try {
      val cents = graft.sim.Ivf.writePartitionedLists(
        emb, dim = 64, path, c = 8, iters = 2)
      assert(cents.length === 8)
      val probed = graft.sim.Ivf.readProbedLists(spark, path, Seq(1, 3))
      val plan = probed.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cid"),
        s"expected a partition-pruned scan, plan:\n$plan")
      // the probe reads exactly the two lists' rows
      val full = spark.read.parquet(path)
      val expected = full.filter(col("cid").isin(1, 3)).count()
      assert(probed.count() === expected && expected > 0)
      assert(probed.count() < full.count())
    } finally {
      import java.nio.file.{Files => F, Path}
      import java.util.Comparator
      F.walk(Path.of(path)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => F.deleteIfExists(p))
    }
  }

  test("salted topKCount is bit-identical to unsalted on a synthetic hub key") {
    // one hub key with 60k witness rows (with duplicates) + long tail
    val hub = spark.range(60000).select(
      lit("HUB").as("k"), concat(lit("w"), (col("id") % 7919)).as("v"))
    val tail = spark.range(2000).select(
      concat(lit("t"), col("id") % 97).as("k"), concat(lit("x"), col("id")).as("v"))
    val df = hub.unionByName(tail)

    val k = 16
    val unsalted = df.groupBy("k")
      .agg(BoundedAggs.topKCount(k)(col("v")).as("wit"))
      .select(col("k"), col("wit.items").as("items"), col("wit.total").as("total"))
    val salted = Salted.topKCountSalted(df, Seq("k"), col("v"), k, salts = 32)
      .select(col("k"), col("wit.items").as("items"), col("wit.total").as("total"))

    val u = unsalted.orderBy("k").collect()
    val s = salted.orderBy("k").collect()
    assert(u.length === s.length)
    u.zip(s).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      assert(a.getSeq[String](1) === b.getSeq[String](1))
      assert(a.getLong(2) === b.getLong(2))
    }
    // the hub row is exact: 7919 distinct witnesses, 60000 rows, K kept
    val hubRow = s.find(_.getString(0) == "HUB").get
    assert(hubRow.getLong(2) === 60000L)
    assert(hubRow.getSeq[String](1).length === k)
  }

  test("grouped top-k plans a PARTIAL WindowGroupLimit before the shuffle (no custom operator needed)") {
    // The engine's pervasive rank<=k window pattern (top1PerGroup, ANN
    // ranking, bucket caps) is planned by Catalyst's own
    // InferWindowGroupLimit as map-side group-limit -> Exchange ->
    // final group-limit — i.e. only ~k rows per group per map task
    // shuffle, not the whole group. This is the declarative-plan
    // dividend: a custom top-k SparkPlan would duplicate a built-in.
    import graft.functions.Aggs
    val df = spark.range(100000).select(
      (col("id") % 100).as("k"), col("id").as("v"))
    val top = Aggs.top1PerGroup(df, Seq("k"), Seq(col("v").desc))
    val plan = top.queryExecution.executedPlan.toString
    val n = "WindowGroupLimit".r.findAllIn(plan).length
    assert(n >= 2, s"expected partial+final WindowGroupLimit, plan:\n$plan")
    assert(top.count() === 100L)
  }

  test("flagship edge evidence: the salted two-phase aggregation engages and is bit-identical") {
    import graft.triples.Triples
    // a hub edge: 5000 pages all witnessing (CUST:hub, ordered, PART:1)
    // — fan-in well past the 1024 evidence cap
    val pages = spark.range(5000).select(
      format_string("https://h.ex/%05d", col("id")).as("url"))
    val mentions = pages
      .select(col("url"), lit("CUST:hub").as("entity_id"),
        lit("customer").as("entity_label"))
      .unionByName(pages.select(col("url"), lit("PARTRAW:1").as("entity_id"),
        lit("product").as("entity_label")))
    val canon = Seq(("CUST:hub", "CUST:hub", 1), ("PARTRAW:1", "PART:1", 1))
      .toDF("raw_id", "canonical_id", "priority")
    val sets = Triples.perPageEntitySets(mentions, canon)
    val one = Triples.evidenceFromSets(sets, canon, salts = 1)
    val two = Triples.evidenceFromSets(sets, canon,
      salts = Triples.DefaultEvidenceSalts)
    // the two-phase plan visibly engages: phase 1 groups on the
    // value-derived salt cell before the per-edge merge
    assert(two.queryExecution.analyzed.toString.contains("__salt"))
    assert(!one.queryExecution.analyzed.toString.contains("__salt"))
    val cols = Seq("subject_id", "relation_label", "object_id",
      "sources", "evidence", "n_pages")
    val a = one.select(cols.map(col): _*).orderBy("subject_id").collect()
    val b = two.select(cols.map(col): _*).orderBy("subject_id").collect()
    assert(a.toSeq === b.toSeq) // bit-identical through the capped hub
    assert(a.length === 1)
    assert(a.head.getLong(5) === 5000L)                       // exact support
    assert(a.head.getString(4).split('|').length === 1024)    // capped witnesses
    assert(a.head.getString(4).startsWith("https://h.ex/00000|https://h.ex/00001"))
  }
}
