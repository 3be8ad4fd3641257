package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.textops.TextOps

/** Integer-exact Lloyd k-means over SQ8-quantized vectors — the
  * TRAINING loop itself made oracle-replayable (the float
  * [[Ivf.trainCentroids]] is deterministic only up to float summation
  * order, so its recall is spec-gated; quantizing the inputs first
  * makes every distance, argmin and floor-mean a whole integer that any
  * engine reproduces bit-for-bit).
  *
  * Contract (all deterministic): codes = [[Quant.sq8Codes]]; seeds =
  * the `c` lowest-id vectors' codes, cid 1..c in id order; assignment =
  * argmin of integer squared-L2 with ties to the LOWEST cid; update =
  * per-dimension floor(sum/n) with empty clusters keeping their
  * previous centroid; exactly `iters` assign→update rounds, then one
  * final assignment reported.
  *
  * Scale shape: the centroid matrix is a dimension (c × dim longs) —
  * a driver/broadcast artifact exactly like [[Ivf.fixedCentroids]];
  * each round is one map-side native-kernel assignment pass
  * ([[graft.functions.VectorExprs.centroidDists]] — codes ≤ 127 and
  * 64-dim squared sums ≤ 2^22 are exact in its doubles) plus one
  * (cid, dim)-keyed integer sum, map-side combined. Nothing per-row
  * ever reaches the driver; the per-round pull is c × dim means.
  */
object KMeansInt {

  /** (cid, n_members, centroid array<long>) after `iters` integer Lloyd
    * rounds; only non-empty clusters under the final assignment are
    * reported. `corpus` needs (id, emb array<float>). */
  def trainAssign(corpus: DataFrame, c: Int, iters: Int): DataFrame = {
    require(c >= 1 && iters >= 1)
    val spark = corpus.sparkSession
    val emb = corpus.select(col("id"),
      Quant.sq8Codes(col("emb")).cast("array<long>").as("z"))
      .persist()
    try {
      var cents: Array[Array[Long]] = emb.orderBy(col("id")).limit(c)
        .select(col("z")).collect()
        .map(_.getSeq[Long](0).toArray)
      require(cents.length == c, s"corpus smaller than c=$c")
      val dim = cents(0).length

      def assigned(cs: Array[Array[Long]]): DataFrame = {
        val d = graft.functions.VectorExprs.centroidDists(
          transform(col("z"), _.cast("float")), cs.map(_.map(_.toDouble)))
        emb.select(col("id"), col("z"),
          TextOps.let(d, a =>
            array_position(a, array_min(a)).cast("long")).as("cid"))
      }

      for (_ <- 1 to iters) {
        val means = assigned(cents)
          .select(col("cid"), posexplode(col("z")).as(Seq("d", "v")))
          .groupBy("cid", "d")
          .agg(floor(sum(col("v")) / count(lit(1))).cast("long").as("mv"))
          .collect()
          .groupBy(_.getLong(0))
        cents = cents.indices.map { i =>
          means.get(i + 1L) match {
            case Some(rows) =>
              val a = new Array[Long](dim)
              rows.foreach(r => a(r.getInt(1)) = r.getLong(2))
              a
            case None => cents(i) // empty cluster keeps its centroid
          }
        }.toArray
      }

      val centDf = broadcast(spark.createDataFrame(
        spark.sparkContext.parallelize(
          cents.zipWithIndex.map { case (z, i) =>
            org.apache.spark.sql.Row((i + 1).toLong, z.toSeq) }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cid",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("centroid",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType, containsNull = false),
            nullable = false)))))
      assigned(cents).groupBy("cid").agg(count(lit(1)).as("n_members"))
        .join(centDf, Seq("cid"))
        .select(col("cid"), col("n_members"), col("centroid"))
        .localCheckpoint(true)
    } finally emb.unpersist()
  }
}
