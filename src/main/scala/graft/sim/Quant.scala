package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector quantization for ANN at 10^12-row scale.
  *
  * A float32 embedding column is the single largest artifact of a
  * web-scale corpus (64 dims × 4 B × 10^12 rows = 256 TB — bigger than
  * the text). The two public compression shapes (FAISS's SQ8 and
  * IVF-PQ, Jégou et al. 2011, "Product Quantization for Nearest
  * Neighbor Search") cut that to 64 B and 8 B per vector respectively;
  * scoring then runs on the compressed form and only the coarse-probe
  * machinery ([[Ivf.ivfCandidates]]) touches row selection.
  *
  * Everything here is deterministic and engine-portable by
  * construction, the same discipline as the LSH/IVF family:
  *  - SQ8 codes come from one floor-based rounding rule (no
  *    banker's-rounding divergence between engines) and are scored with
  *    EXACT integer dot products;
  *  - PQ codebooks are closed-form integer-mix values (the
  *    [[Ivf.fixedCentroids]] formula over global dimension × codeword)
  *    — the "trained offline, shipped with the job" artifact shape —
  *    so encoding argmins and ADC distances reproduce bit-for-bit in
  *    DuckDB, and both paths are full value-level oracles.
  */
object Quant {

  // ---------------------------------------------------------------- SQ8

  /** int8 scalar quantization: code = clamp(floor(x·127 + 0.5), ±127)
    * as TINYINT — 64 B/vector, 4× smaller than float32. floor(x+0.5)
    * (round-half-up) is used instead of round() because Java and C
    * engines disagree on half-even vs half-away ties; floor is
    * identical everywhere. */
  def sq8Codes(emb: Column): Column =
    transform(emb, x =>
      greatest(least(floor(x.cast("double") * lit(127.0) + lit(0.5)),
        lit(127L)), lit(-127L)).cast("byte"))

  /** Exact integer dot of two int8 code arrays. LONG accumulator —
    * max |dot| = 64·127² ≈ 10^6, overflow-free at any dim that fits a
    * row. Sum order is irrelevant (exact integers), unlike the float
    * folds, so this aggregates map-side with no ordering caveat.
    * Native fused kernel (VectorExprs.ByteDot); [[intDotHof]] is the
    * composable form it equals value-for-value (QuantGraphSpec). */
  def intDot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.byteDot(a, b)

  /** The aggregate(zip_with(...)) formulation of [[intDot]] — kept as
    * the executable specification of the native kernel. */
  def intDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** IVF-SQ8 approximate cosine top-k: coarse-probe candidates from
    * [[Ivf.ivfCandidates]] (bounded inverted lists — never all-pairs),
    * then score with the quantized cosine dotq/(|a_q||b_q|). The only
    * floats are two sqrt's of exact integers and one division — both
    * IEEE-identical across engines. */
  def ivfTopKSq8(corpus: DataFrame, k: Int, nprobe: Int, maxList: Int,
                 centroids: Array[Array[Double]]): DataFrame = {
    val cand = Ivf.ivfCandidates(corpus, centroids, nprobe, maxList)
    val qz = corpus.select(col("id"), sq8Codes(col("emb")).as("z"))
      .withColumn("sd", intDot(col("z"), col("z")))
    val scored = cand
      .join(qz.select(col("id").as("vec_id"), col("z").as("qz"),
        col("sd").as("qsd")), "vec_id")
      .join(qz.select(col("id").as("neighbor_id"), col("z").as("cz"),
        col("sd").as("csd")), "neighbor_id")
      .withColumn("sim", intDot(col("qz"), col("cz")).cast("double") /
        (sqrt(col("qsd")) * sqrt(col("csd"))))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id")
  }

  // ----------------------------------------------------------------- PQ

  /** Product-quantizer geometry: 64 dims = M=8 subspaces × 8 dims,
    * Ks=16 codewords per subspace → one 4-bit code per subspace,
    * 8 small ints per vector (8 B packed — 32× smaller than float32). */
  val PqM = 8
  val PqSubDim = 8
  val PqKs = 16

  /** Closed-form codebook value for global dimension `gd` (0-based)
    * and codeword `j` (1-BASED, matching array_position): the
    * [[Ivf.fixedCentroids]] integer mix, so any engine rebuilds the
    * identical doubles from two small integers. */
  def pqCbVal(gd: Int, j: Int): Double =
    (((gd + 1).toLong * 2654435761L + j.toLong * 40503L) % 1048576L)
      .toDouble / 524288.0 - 1.0

  private def subCents(m: Int): Array[Array[Double]] =
    Array.tabulate(PqKs, PqSubDim)((j, dl) =>
      pqCbVal(m * PqSubDim + dl, j + 1))

  /** PQ encoding: per subspace the 1-based argmin codeword (first
    * minimum wins — array_position semantics, mirrored by the oracle's
    * ORDER BY dist, j). Each subspace distance array runs through the
    * native [[graft.functions.VectorExprs.CentroidDists]] kernel over
    * a slice of the embedding, so encoding is codegen'd end-to-end. */
  def pqCodes(emb: Column): Column =
    array((0 until PqM).map { m =>
      val dists = graft.functions.VectorExprs.centroidDists(
        slice(emb, m * PqSubDim + 1, PqSubDim), subCents(m))
      graft.textops.TextOps.let(dists,
        a => array_position(a, array_min(a)).cast("int"))
    }: _*)

  /** Asymmetric (ADC) squared-L2 distance: full-precision query vs the
    * codebook reconstruction of a coded neighbor. Sequential fold over
    * gd = 0..63 with seed 0.0 and (diff·diff) terms — the exact
    * CentroidDists summation shape, reproduced verbatim in the oracle's
    * list_reduce. Native fused kernel (VectorExprs.AdcDist);
    * [[adcDistHof]] is the composable form it matches bit-for-bit
    * (VectorExprSpec) — the interpreted per-dimension lambda made the
    * HOF form the dominant CPU of q_knn_pq at coarse-probe candidate
    * volumes. */
  def adcDist(q: Column, code: Column): Column =
    graft.functions.VectorExprs.adcDist(q, code, PqSubDim, PqM * PqSubDim)

  /** The aggregate(sequence(...)) formulation of [[adcDist]] — kept as
    * the executable specification of the native kernel. */
  def adcDistHof(q: Column, code: Column): Column =
    aggregate(sequence(lit(0), lit(PqM * PqSubDim - 1)), lit(0.0),
      (acc, gd) => {
        val j = element_at(code,
          floor(gd.cast("double") / lit(PqSubDim.toDouble)).cast("int") + 1)
        val cv = pmod(
          (gd + 1).cast("long") * lit(2654435761L) + j.cast("long") * lit(40503L),
          lit(1048576L)).cast("double") / lit(524288.0) - 1.0
        val d = element_at(q, gd + 1).cast("double") - cv
        acc + d * d
      })

  /** IVF-PQ top-k (the FAISS IVFPQ shape — THE public design for
    * 10^12-vector ANN): coarse probe via [[Ivf.ivfCandidates]], rank
    * candidates by ADC distance to their 8-byte PQ codes. The corpus
    * side of the scoring join carries ONLY (id, code) — at scale the
    * inverted lists store codes, not vectors, which is where the 32×
    * memory cut lands. */
  def ivfTopKPq(corpus: DataFrame, k: Int, nprobe: Int, maxList: Int,
                centroids: Array[Array[Double]]): DataFrame = {
    val cand = Ivf.ivfCandidates(corpus, centroids, nprobe, maxList)
    val codes = corpus.select(col("id").as("neighbor_id"),
      pqCodes(col("emb")).as("pc"))
    val scored = cand
      .join(corpus.select(col("id").as("vec_id"), col("emb").as("qe")), "vec_id")
      .join(codes, "neighbor_id")
      .withColumn("dist", adcDist(col("qe"), col("pc")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id")
  }
}
