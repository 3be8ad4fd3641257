package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-family cost attribution probe: times each breadth-block edge
  * builder standalone at a given SF (count action, warm-ish JVM) so an
  * edges-stage wall regression is attributable to a NAMED family
  * instead of a campaign guess — the same discipline as
  * Pipeline.mark's per-stage counters, one level finer. */
object FamProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.fixtures.Corpus
    val canon = Corpus.canonicalIds(spark, dir).localCheckpoint(true)
    def t(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"[fam] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    t("shares_part")(Corpus.sharesPartEdges(spark, dir, canon))
    t("co_purchased")(Corpus.coPurchasedEdges(spark, dir))
    t("cites")(Corpus.citesEdges(spark, dir))
    t("touched")(Corpus.touchedEdges(spark, dir))
    t("peer_of")(Corpus.peerOfEdges(spark, dir))
    t("next_order")(Corpus.nextOrderEdges(spark, dir))
    t("returned")(Corpus.returnedEdges(spark, dir, canon))
    t("ships_to")(Corpus.shipsToEdges(spark, dir))
    t("similar_to")(Corpus.similarToEdges(spark, dir))
    t("followed_by")(Corpus.followedByEdges(spark, dir))
    t("located_in_region")(Corpus.locatedInRegionEdges(spark, dir))
    t("best_supplied_by")(Corpus.bestSupplierEdges(spark, dir, canon))
    t("closest_to")(Corpus.closestPartEdges(spark, dir))
    t("in_family")(Corpus.inFamilyEdges(spark, dir))
    t("variant_of")(Corpus.variantOfEdges(spark, dir))
    t("bundle_with")(Corpus.bundleWithEdges(spark, dir, canon))
    t("regulates")(Corpus.regulatesEdges(spark, dir))
    t("prefers")(Corpus.prefersEdges(spark, dir))
    t("bought_from")(Corpus.boughtFromEdges(spark, dir))
    t("repr_order")(Corpus.representativeOrderEdges(spark, dir))
    t("charged_with")(Corpus.chargedWithEdges(spark, dir))
    t("dominant_lang")(Corpus.dominantLangEdges(spark, dir))
    t("handles")(Corpus.handlesEdges(spark, dir))
    spark.stop()
  }
}
