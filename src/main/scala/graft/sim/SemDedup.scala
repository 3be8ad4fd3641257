package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** SemDeDup — semantic deduplication scoped to embedding clusters
  * (Abbas et al. 2023, arXiv:2303.09540, the published web-scale
  * semantic-dedup recipe): assign every vector to its nearest
  * centroid, compare pairs ONLY within a cluster (never all-pairs —
  * the cluster plays the role the LSH bucket plays in
  * [[Knn.lshNearDupPairs]]), and for each duplicate pair KEEP the
  * member farther from the centroid — the paper's
  * keep-low-centroid-similarity rule: the less prototypical example
  * carries more information.
  *
  * Centroids are the same closed-form fixed quantizer as
  * [[Ivf.fixedCentroids]] (the trained-offline, shipped-with-the-job
  * deployment shape), so assignment, the cluster-size cap, the pair
  * threshold and the keep rule ALL reproduce in DuckDB: the whole
  * operator is value-level oracle-checked, not just row-counted.
  *
  * Scale design: one shuffle on the 4-byte cid for the ranking window,
  * one cid-keyed self-join whose work is bounded by sum of
  * min(cluster, maxCluster)^2 — a pathological mega-cluster degrades
  * to logged recall loss (over-cap rows skip dedup and are KEPT),
  * never to a quadratic stage.
  */
object SemDedup {

  /** dot(e, cent(cid)) / norm(e): similarity of a row to its OWN
    * cluster's closed-form centroid, up to the norm(cent) factor —
    * constant within a cluster, so within-cluster comparisons are
    * unchanged by omitting it. Sequential double fold, the same
    * summation order DuckDB's list_reduce replays. */
  private def centScore(emb: Column, cid: Column, dim: Int): Column = {
    val cent = transform(sequence(lit(1), lit(dim)),
      d => ((d.cast("long") * lit(2654435761L) + cid.cast("long") * lit(40503L))
        % lit(1048576L)).cast("double") / lit(524288.0) - lit(1.0))
    aggregate(zip_with(emb, cent, (x, y) => x.cast("double") * y),
      lit(0.0), (acc, v) => acc + v) / Knn.norm(emb)
  }

  /** Returns the KEPT set (id, cid) of `corpus` (id, emb) after
    * cluster-scoped near-dup pruning at cosine >= tau. */
  def semDedup(corpus: DataFrame, c: Int, dim: Int, tau: Double,
               maxCluster: Int): DataFrame = {
    val cents = Ivf.fixedCentroids(c, dim)
    val dists = graft.functions.VectorExprs.centroidDists(col("emb"), cents)
    val assigned = corpus.select(col("id"), col("emb"),
      graft.textops.TextOps.let(dists,
        a => array_position(a, array_min(a)).cast("int")).as("cid"))
    val ranked = assigned
      .withColumn("rn", row_number().over(Window.partitionBy("cid").orderBy("id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nOver = ranked.filter(col("rn") > maxCluster).count()
    if (nOver > 0)
      println(s"[semDedup] $nOver rows over cluster cap=$maxCluster kept undeduped")
    val capped = ranked.filter(col("rn") <= maxCluster)
      .withColumn("cs", centScore(col("emb"), col("cid"), dim))
    val a = capped.select(col("cid"), col("id").as("id1"),
      col("emb").as("e1"), col("cs").as("cs1"))
    val b = capped.select(col("cid"), col("id").as("id2"),
      col("emb").as("e2"), col("cs").as("cs2"))
    // drop the higher-centroid-similarity member; tie keeps the lower id
    val drops = a.join(b, Seq("cid"))
      .filter(col("id1") < col("id2"))
      .filter(Knn.cosine(col("e1"), col("e2")) >= tau)
      .select(when(col("cs1") > col("cs2"), col("id1"))
        .otherwise(col("id2")).as("id"))
      .distinct()
    val kept = ranked.select("id", "cid")
      .join(drops, Seq("id"), "left_anti")
      .localCheckpoint(true)
    ranked.unpersist(false)
    kept
  }
}
