package graft

import java.nio.file.{Files, Paths}

/** Plan audit: dumps .explain("formatted") for key queries so pushdown /
  * broadcast / codegen spans can be reviewed (and cited in BENCH docs).
  * Usage: Test/runMain graft.DumpPlans <outFile> [sfDir]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/plans.txt")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_mentions", "q_triples", "q_edges_props",
      "q_mentions_ranked", "q_merge_edges", "q_semi_join",
      "q_doc_stats", "q_knn_cosine", "q_knn_lsh", "q_knn_ivf",
      "q_minhash_neardup", "q_pair_dedup", "q_dedup_exact",
      "q_supply_edges", "q_merge_dti", "q_go_labels", "q_typed_edges",
      "q_top1_per_group", "q_shares_part", "q_co_purchased",
      "q_similar_to", "q_best_supplier", "q_closest_part",
      "q_followed_by", "q_ngram_jaccard",
      // breadth block 5
      "q_in_family", "q_variant_of", "q_bundle_with", "q_regulates",
      "q_prefers", "q_bought_from", "q_repr_order", "q_charged_with",
      "q_dominant_lang", "q_handles",
      // round 6
      "q_span_dedup", "q_doc_repetition", "q_user_sessions",
      "q_schema_rollup", "q_doc_tokens_bpe",
      "q_decontaminate", "q_url_canon", "q_filter_funnel",
      "q_mix_sample", "q_stratified_sample", "q_pii_redact",
      // round-6 breadth wave
      "q_triangles", "q_kcore", "q_web_graph", "q_anchor_edges",
      "q_recrawl_latest", "q_vocab_topk", "q_dsir_select",
      "q_doc_keywords", "q_kmeans", "q_crawl_diff",
      "q_label_prop", "q_random_walks")
    val sb = new StringBuilder
    names.foreach { n =>
      sb.append(s"===== $n =====\n")
      val df = SparkEntry.queries(n)(spark, sfDir)
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"PLANS written to $out")
    spark.stop()
  }
}
