package graft

import org.apache.spark.sql.functions._

/** Mention-path scaling probe: the broadcast-trie scan in isolation
  * (map-only — no shuffle, no store writes; the page texts are
  * materialized once, so the timed region is purely the primitive
  * open-addressed trie walking tokens). Isolates the round-3 trie
  * rework's thread scaling from the shuffle/write stages of the full
  * pipeline.
  * Usage: Test/runMain graft.MentionScale <cpus> [replicas]
  */
object MentionScale {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    val pages = graft.fixtures.Corpus.pageText(spark, sfDir)
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .select(concat(col("url"), lit("#"), col("rep")).as("url"), col("text"))
      .repartition(cpus.toInt * 4)
      .localCheckpoint(true)
    val dict = graft.fixtures.Corpus.aliasDict(spark, sfDir)
    spark.range(100000).count() // warm
    // one warm-up pass (trie build + codegen), then the timed pass
    graft.link.Linker.mentions(pages, dict).count()
    val nPages = pages.count()
    val t0 = System.nanoTime()
    val n = graft.link.Linker.mentions(pages, dict).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"MENTIONSCALE cpus=$cpus reps=$reps pages=$nPages mentions=$n " +
      f"sec=$secs%.2f pages_per_sec=${nPages / secs}%.0f")
    spark.stop()
  }
}
