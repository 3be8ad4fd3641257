package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.shim
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{FloatDotRewrite, GraftExtensions}
import graft.sim.Knn

/** The optimizer rule must rewrite the declarative HOF dot-product
  * into the native kernel — same results, faster plan — and the SQL
  * function registration must make `float_dot`/`srp_sig` callable
  * from plain SQL.
  */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("emb"))

  test("FloatDotRewrite rewrites aggregate(zip_with(...)) into the native kernel") {
    GraftExtensions.uninstall(spark) // other specs' tune() may have installed it
    val pairs = emb.select(col("id"), col("emb").as("e1"), col("emb").as("e2"))
    val hof = pairs.select(col("id"), Knn.dotHof(col("e1"), col("e2")).as("d"))

    // without the rule: the HOF stays
    assert(hof.queryExecution.optimizedPlan.toString.contains("aggregate("))
    assert(!hof.queryExecution.optimizedPlan.toString.contains("float_dot("))

    GraftExtensions.install(spark)
    try {
      val rewritten = pairs.select(col("id"), Knn.dotHof(col("e1"), col("e2")).as("d"))
      val plan = rewritten.queryExecution.optimizedPlan.toString
      assert(plan.contains("float_dot("), s"expected rewrite, plan:\n$plan")
      // bit-identical results to the un-rewritten HOF evaluation
      val a = hof.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
      val b = rewritten.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(a.length === b.length)
      a.zip(b).foreach { case ((i1, d1), (i2, d2)) =>
        assert(i1 === i2)
        assert(java.lang.Double.doubleToLongBits(d1) ===
          java.lang.Double.doubleToLongBits(d2))
      }
      // install is idempotent
      GraftExtensions.install(spark)
      assert(spark.experimental.extraOptimizations.count(_ == FloatDotRewrite) === 1)
    } finally GraftExtensions.uninstall(spark)
    assert(!spark.experimental.extraOptimizations.contains(FloatDotRewrite))
  }

  test("reversed factor order and non-float arrays: rewrite applies/skips correctly") {
    GraftExtensions.install(spark)
    try {
      // (y, x) product order still rewrites (IEEE multiply commutes)
      val rev = emb.select(aggregate(
        zip_with(col("emb"), col("emb"), (x, y) => y.cast("double") * x.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d"))
      assert(rev.queryExecution.optimizedPlan.toString.contains("float_dot("))

      // array<double> input: pattern must NOT fire (kernel is float-typed)
      val dbl = emb.select(transform(col("emb"), _.cast("double")).as("de"))
        .select(aggregate(
          zip_with(col("de"), col("de"), (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("d"))
      assert(!dbl.queryExecution.optimizedPlan.toString.contains("float_dot("))
    } finally GraftExtensions.uninstall(spark)
  }

  test("IntersectCountRewrite: size(array_intersect) over long arrays -> native kernel; skips string arrays") {
    import graft.textops.DedupOps
    val sets = DedupOps.shingleCodes(
      graft.fixtures.Corpus.table(spark, TestSpark.sf0001, "documents")
        .select("doc_id", "text"), "doc_id", "text", 3)
    val pairs = sets.select(col("doc_id"), col("shc").as("a"))
      .crossJoin(sets.select(col("shc").as("b")).limit(1))
    val plain = pairs.select(col("doc_id"),
      size(array_intersect(col("a"), col("b"))).as("c"))
    assert(!plain.queryExecution.optimizedPlan.toString.contains("intersect_count"))
    GraftExtensions.install(spark)
    try {
      val rewritten = pairs.select(col("doc_id"),
        size(array_intersect(col("a"), col("b"))).as("c"))
      val plan = rewritten.queryExecution.optimizedPlan.toString
      assert(plan.contains("intersect_count"), s"expected rewrite, plan:\n$plan")
      // identical counts to the built-in evaluation
      val want = plain.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1)))
      val got = rewritten.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(want.nonEmpty && want.exists(_._2 > 0))
      assert(want.toSeq == got.toSeq)
      // string arrays are NOT rewritten (kernel is long-specialized)
      val strs = Seq((Seq("a", "b"), Seq("b", "c"))).toDF("x", "y")
        .select(size(array_intersect(col("x"), col("y"))).as("c"))
      assert(!strs.queryExecution.optimizedPlan.toString.contains("intersect_count"))
      assert(strs.as[Int].head() == 1)
    } finally GraftExtensions.uninstall(spark)
  }

  test("intersect_count kernel: nulls, duplicates, empties match size(array_intersect) exactly") {
    import graft.functions.TextHashExprs
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 2L, 3L, null), Seq[java.lang.Long](2L, 3L, 4L, null)),
      (2L, Seq[java.lang.Long](), Seq[java.lang.Long](1L)),
      (3L, Seq[java.lang.Long](5L, 5L, 5L), Seq[java.lang.Long](5L)),
      (4L, Seq[java.lang.Long](null), Seq[java.lang.Long](1L)),
      (5L, Seq[java.lang.Long](7L, 8L), Seq[java.lang.Long]()))
      .toDF("id", "a", "b")
    val both = df.select(col("id"),
        TextHashExprs.intersectCountCol(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).as("s"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    both.foreach { case (id, k, s) => assert(k == s, s"id=$id kernel=$k builtin=$s") }
    // null array -> null in both forms
    val withNull = df.withColumn("a",
        when(col("id") === 1L, lit(null).cast("array<bigint>")).otherwise(col("a")))
      .select(col("id"),
        TextHashExprs.intersectCountCol(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).as("s"))
      .filter(col("id") === 1L).collect().head
    assert(withNull.isNullAt(1) && withNull.isNullAt(2))
  }

  test("float_dot and srp_sig are callable from SQL once registered") {
    shim.registerFunction(spark, GraftExtensions.floatDotFn)
    shim.registerFunction(spark, GraftExtensions.srpSigFn)
    shim.registerFunction(spark, GraftExtensions.intersectCountFn)
    assert(spark.sql(
      "SELECT intersect_count(array(1L,2L,2L,3L), array(2L,3L,4L)) AS c")
      .as[Int].head() == 2)
    emb.createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      """SELECT id, float_dot(emb, emb) AS d, srp_sig(emb, 6, 0) AS s
        |FROM ext_emb""".stripMargin)
      .orderBy("id").collect()
    val viaCol = emb.select(col("id"),
        Knn.dot(col("emb"), col("emb")).as("d"),
        Knn.srpSignature(col("emb"), 6, 0).as("s"))
      .orderBy("id").collect()
    assert(viaSql.length === viaCol.length && viaSql.nonEmpty)
    viaSql.zip(viaCol).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(java.lang.Double.doubleToLongBits(a.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(b.getDouble(1)))
      assert(a.getLong(2) === b.getLong(2))
    }
  }
}
