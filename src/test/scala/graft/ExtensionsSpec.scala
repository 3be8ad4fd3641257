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

  test("float_dot and srp_sig are callable from SQL once registered") {
    shim.registerFunction(spark, GraftExtensions.floatDotFn)
    shim.registerFunction(spark, GraftExtensions.srpSigFn)
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
