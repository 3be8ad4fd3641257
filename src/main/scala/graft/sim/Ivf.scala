package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.textops.TextOps

/** IVF-style approximate nearest neighbor: a k-means coarse quantizer
  * partitions the corpus into C inverted lists; a query scores only the
  * lists of its `nprobe` nearest centroids.
  *
  * Scale shape: centroids are a dimension (C × dim doubles) that lives
  * on the driver/broadcast; assignment and probing are map-side
  * expressions; the only shuffle is the candidate equi-join on the
  * centroid id. At 10^12 rows the assigned corpus is written
  * partitioned by `cid`, so a probe reads nprobe/C of the data — the
  * partition-pruning analogue of FAISS's inverted lists.
  *
  * Training determinism: seeds are the C lowest-id vectors and
  * iteration count is fixed; centroid means are distributed float
  * averages, so training is deterministic up to float summation order
  * (assignment ties break on the first minimum). Recall is spec-gated
  * against brute force on the 64-dim fixture.
  */
object Ivf {

  /** Squared-L2 distance array from `emb` to every centroid — the
    * native codegen'd kernel (one fused loop with the centroid matrix
    * as a broadcast-style reference object). The old unrolled Column
    * form was C×dim expression terms: at autoC-scale centroid counts
    * the analyzer and codegen went quadratic, dwarfing the actual math
    * ([[graft.functions.VectorExprs.CentroidDists]] documents the
    * float-order parity). */
  private def distArray(emb: Column, cents: Array[Array[Double]]): Column =
    graft.functions.VectorExprs.centroidDists(emb, cents)

  /** 1-based argmin over the distance array (first minimum wins). */
  private def argmin(emb: Column, cents: Array[Array[Double]]): Column =
    TextOps.let(distArray(emb, cents),
      a => array_position(a, array_min(a)).cast("int"))

  /** Deterministically-seeded k-means over (id, emb). Returns C
    * centroids after `iters` Lloyd rounds (empty clusters keep their
    * previous centroid). */
  def trainCentroids(corpus: DataFrame, dim: Int, c: Int,
                     iters: Int): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = corpus.orderBy(col("id")).limit(c)
      .select(col("emb")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(cents.length == c, s"corpus smaller than c=$c")
    val meanCols = (0 until dim).map(d =>
      avg(element_at(col("emb"), d + 1).cast("double")).as(s"m$d"))
    for (_ <- 0 until iters) {
      val updated = corpus
        .select(col("emb"), argmin(col("emb"), cents).as("cid"))
        .groupBy("cid")
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (0 until dim).map(d => r.getDouble(d + 1)).toArray)
        .toMap
      cents = cents.zipWithIndex.map { case (old, j) =>
        updated.getOrElse(j + 1, old) // array_position is 1-based
      }
    }
    cents
  }

  /** Centroid count sized from the corpus so the EXPECTED inverted list
    * N/C stays at `targetList` as N grows — the corpus-derived
    * parameterization that keeps per-list work bounded (the analogue of
    * Knn.autoPlanes; a fixed C=16 at 10^12 rows means 10^10-row lists
    * and a quadratic probe join). */
  def autoC(n: Long, targetList: Long = 2048L): Int =
    math.max(4L, math.min(1L << 20, (n + targetList - 1) / targetList)).toInt

  /** Deterministic FIXED centroid matrix from the same public integer
    * mix as the SRP hyperplanes (Knn.coeff): centroid j, dimension d =
    * pmod((d+1)·2654435761 + (j+1)·40503, 2^20)/2^19 − 1 — exact small-
    * integer arithmetic plus one power-of-two division, so ANY engine
    * rebuilds the identical doubles and the whole IVF path (assignment,
    * list cap, probing, scoring) becomes DuckDB-oracle-checkable. At
    * scale this is the "centroids trained offline, shipped with the
    * job" deployment shape: [[ivfTopK]] takes them via `centroids` and
    * never re-trains per query. */
  def fixedCentroids(c: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(c, dim) { (j, d) =>
      (((d + 1).toLong * 2654435761L + (j + 1).toLong * 40503L) % 1048576L)
        .toDouble / 524288.0 - 1.0
    }

  /** Materialize the inverted lists as a cid-partitioned parquet layout
    * — the on-disk form of the 10^12-row scale path: a probe of
    * `nprobe` lists reads ONLY those partitions (Catalyst partition
    * pruning; spec-asserted via PartitionFilters in the scan). Returns
    * the centroids used for assignment. */
  def writePartitionedLists(corpus: DataFrame, dim: Int, path: String,
                            c: Int = 0, iters: Int = 5,
                            targetList: Long = 2048L,
                            centroids: Option[Array[Array[Double]]] = None)
      : Array[Array[Double]] = {
    val cc = if (c > 0) c else autoC(corpus.count(), targetList)
    val cents = centroids.getOrElse(trainCentroids(corpus, dim, cc, iters))
    corpus.select(col("id"), col("emb"), argmin(col("emb"), cents).as("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(path)
    cents
  }

  /** Read back ONLY the probed inverted lists (a partition-pruned scan). */
  def readProbedLists(spark: org.apache.spark.sql.SparkSession, path: String,
                      probeCids: Seq[Int]): DataFrame =
    spark.read.parquet(path).filter(col("cid").isin(probeCids: _*))

  /** The shared IVF probe machinery: assign capped inverted lists,
    * probe the `nprobe` nearest lists per query, and return the deduped
    * candidate (vec_id, neighbor_id) pairs — materialized, with every
    * cached intermediate released. [[ivfTopK]] scores these exactly;
    * the quantized variants ([[Quant.ivfTopKSq8]], [[Quant.ivfTopKPq]])
    * score the SAME candidates with compressed arithmetic, so all three
    * share one probe plan and differ only in the scoring expression. */
  def ivfCandidates(corpus: DataFrame, cents: Array[Array[Double]],
                    nprobe: Int, maxList: Int): DataFrame = {
    // ONE pass computes everything derived from the distance array: the
    // nprobe nearest centroid ids, sorted — list assignment is its
    // first element (argmin == nearest probe). Persisted, because three
    // consumers (drop-count, capped lists, probe explode) would
    // otherwise each recompute the full-corpus distance map — the
    // recomputation that made the query path 39 s driver-recorded.
    val probeIds = TextOps.let(distArray(col("emb"), cents), a =>
      transform(
        slice(array_sort(transform(sequence(lit(0), lit(cents.length - 1)),
          j => struct(element_at(a, j + 1).as("d"), j.as("i")))), 1, nprobe),
        s => s.getField("i") + 1))
    val probed = corpus.select(col("id"), probeIds.as("pids"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wL = Window.partitionBy("cid").orderBy(col("neighbor_id"))
    // The ranked assignment is ALSO persisted: the drop-count action and
    // the capped-list filter share one window pass instead of two.
    val rankedL = probed
      .select(col("id").as("neighbor_id"), element_at(col("pids"), 1).as("cid"))
      .withColumn("rn", row_number().over(wL))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDropped = rankedL.filter(col("rn") > maxList).count()
    if (nDropped > 0)
      println(s"[ivfTopK] dropped $nDropped inverted-list members over cap=$maxList")
    val assigned = rankedL.filter(col("rn") <= maxList).drop("rn")
    val probes = probed.select(col("id").as("vec_id"), explode(col("pids")).as("cid"))
    // Materialize the deduped candidate pairs, then release both cached
    // intermediates (bench reps must not accumulate cached partitions).
    val cand = probes.join(assigned, "cid")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .select("vec_id", "neighbor_id")
      .distinct()
      .localCheckpoint(true)
    rankedL.unpersist(false)
    probed.unpersist(false)
    cand
  }

  /** IVF approximate cosine top-k over `corpus` (id, emb): train (or
    * reuse) centroids, assign inverted lists, probe the `nprobe`
    * nearest lists per query, score candidates exactly.
    *
    * `c` <= 0 derives the centroid count from the corpus size via
    * [[autoC]](n, targetList). `maxList` truncates oversize inverted
    * lists deterministically (row_number by id — the skew guard: a hot
    * list otherwise goes quadratic in the probe join); drops are
    * logged, never silent. */
  def ivfTopK(corpus: DataFrame, dim: Int, k: Int,
              c: Int = 0, iters: Int = 5, nprobe: Int = 8,
              targetList: Long = 2048L, maxList: Int = 4096,
              centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    // With explicit centroids the count() sizing action is skipped
    // entirely; autoC only runs when we must also train.
    val cents = centroids.getOrElse {
      val cc = if (c > 0) c else autoC(corpus.count(), targetList)
      trainCentroids(corpus, dim, cc, iters)
    }
    val cand = ivfCandidates(corpus, cents, nprobe, maxList)
    val nrm = corpus.select(col("id"), col("emb"), Knn.norm(col("emb")).as("n"))
    val scored = cand
      .join(nrm.select(col("id").as("vec_id"), col("emb").as("qe"), col("n").as("qn")), "vec_id")
      .join(nrm.select(col("id").as("neighbor_id"), col("emb").as("ce"), col("n").as("cn")), "neighbor_id")
      .withColumn("sim", Knn.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id")
  }
}
