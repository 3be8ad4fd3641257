package graft

import org.apache.spark.sql.functions._

/** Compute-bound scaling probe: brute-force cosine top-k over a
  * replicated embedding corpus (arithmetic-dominated, cache-resident —
  * isolates engine scaling from the memory-bandwidth ceiling the
  * string-heavy pipeline hits on a single socket).
  * Usage: Test/runMain graft.KnnScale <cpus> [replicas]
  */
object KnnScale {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val reps = if (args.length > 1) args(1).toInt else 8
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .select((col("vec_id") + col("rep") * 1000000L).as("id"), col("embedding").as("emb"))
      .repartition(cpus.toInt)
      .localCheckpoint(true)
    val queries = emb.filter(pmod(col("id"), lit(20)) === 0).localCheckpoint(true)
    spark.range(100000).count() // warm
    val t0 = System.nanoTime()
    val n = graft.sim.Knn.bruteForceTopK(queries, emb, 5).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val nq = queries.count(); val nc = emb.count()
    println(f"KNNSCALE cpus=$cpus reps=$reps queries=$nq corpus=$nc rows=$n " +
      f"sec=$secs%.2f pairs_per_sec=${nq * nc / secs}%.0f")
    spark.stop()
  }
}
