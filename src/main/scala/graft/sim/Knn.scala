package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k (exact — the oracle path).
  * Scale path: multi-table sign-random-projection LSH with hamming-1
  * multi-probe and a per-bucket candidate cap:
  *  - planes are sized from the corpus (expected bucket ≤ target) via
  *    [[autoPlanes]], so buckets stay bounded as N grows;
  *  - candidates come from equi-joins on (table, signature) — never an
  *    all-pairs join; the probe side expands each vector to its
  *    hamming-1 signature neighborhood (recall without more tables);
  *  - oversize buckets are capped deterministically (row_number by id)
  *    on the corpus side, and the drop count is logged, never silent.
  *
  * On corpora with real neighbor structure (near-duplicates, clustered
  * embeddings) the bucket join prunes aggressively; on uniformly random
  * vectors (the synthetic fixture: top-5 cosine ≈ 0.32) ANY LSH needs a
  * large candidate fraction for high recall — the fixture gate asserts
  * recall ≥ 0.8 vs brute force, which (6 planes, 8 tables, probe) meets.
  */
object Knn {

  /** dot(a,b) computed in double, sequential left fold (deterministic
    * summation order — oracle-comparable). Native codegen'd expression;
    * [[dotHof]] is the composable higher-order-function form it is
    * bit-identical to (cross-checked in VectorExprSpec). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.floatDot(a, b)

  /** The `aggregate(zip_with(...))` formulation of [[dot]] — kept as
    * the executable specification of the native expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k neighbors for the `queries` rows
    * against the full `corpus`. Both must have (id, emb) columns.
    * Deterministic tie-break by neighbor id.
    * Norms are computed ONCE per vector before the pair join (3× fewer
    * array folds than cosine-per-pair); the pair score is then a single
    * dot product — the hot loop a 100 TB ANN sweep lives in. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("vec_id"), col("emb").as("qe"),
      norm(col("emb")).as("qn"))
    val c = corpus.select(col("id").as("neighbor_id"), col("emb").as("ce"),
      norm(col("emb")).as("cn"))
    val scored = q.join(c, col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id")
  }

  /** Deterministic pseudo-random hyperplane coefficient for (plane p,
    * dimension d): a fixed integer mix mapped to [-1, 1). Pure integer
    * arithmetic + one exact power-of-two division — any engine
    * reproduces it bit-for-bit. */
  private def coeff(p: Int, d: Column): Column = {
    val mixed = pmod(
      (d + 1) * lit(2654435761L) + lit((p + 1) * 40503L), lit(1048576L))
    mixed.cast("double") / lit(524288.0) - 1.0
  }

  /** Sign-random-projection bucket signature (nPlanes bits) per vector —
    * the LSH/IVF-style coarse quantizer. `table` offsets the plane set
    * so multiple independent tables share one formula. Native codegen'd
    * loop; [[srpSignatureUnrolled]] is the Column form it matches
    * bit-for-bit. The projection dimensionality is the runtime array
    * length (no `dim` parameter — a dim smaller than the array would
    * silently be ignored, so the API doesn't offer one). */
  def srpSignature(emb: Column, nPlanes: Int, table: Int = 0): Column =
    graft.functions.VectorExprs.srpSig(emb, nPlanes, table)

  /** The unrolled per-plane Column formulation of [[srpSignature]] —
    * kept as the executable specification of the native expression. */
  def srpSignatureUnrolled(emb: Column, dim: Int, nPlanes: Int, table: Int = 0): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = (0 until dim).map(d =>
        element_at(emb, d + 1).cast("double") * coeff(p + table * nPlanes, lit(d)))
        .reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Plane count so the EXPECTED bucket size N/2^b is at most
    * `targetBucket` — the corpus-size-derived parameterization that
    * keeps within-bucket work bounded as N grows. */
  def autoPlanes(n: Long, targetBucket: Long = 1024L): Int = {
    var b = 4
    while ((n >> b) > targetBucket && b < 30) b += 1
    b
  }

  /** ONE persisted corpus pass shared by both LSH paths: every
    * (table, signature) assignment per row, with its per-bucket rank
    * (deterministic by id). The caller unpersists after deriving its
    * query/corpus sides — the rank lets the drop-count action, the
    * capped corpus side, and (for topK) the probe query side all share
    * a single scan + window pass. */
  private def rankedBucketAssignments(corpus: DataFrame, nPlanes: Int,
                                      nTables: Int): DataFrame = {
    val sigArr = array((0 until nTables).map(t =>
      struct(lit(t).as("tbl"),
        srpSignature(col("emb"), nPlanes, t).as("sig"))): _*)
    val wB = Window.partitionBy("tbl", "sig").orderBy(col("id"))
    corpus
      .select(col("id"), explode(sigArr).as("ts"))
      .select(col("id"), col("ts.tbl").as("tbl"), col("ts.sig").as("sig"))
      .withColumn("rn", row_number().over(wB))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Deterministic per-bucket cap over a [[rankedBucketAssignments]]
    * frame, drops logged — the shared guard that keeps a pathological
    * hub bucket from going quadratic in EITHER LSH path. The same pass
    * also reports the corpus id range: when ids fit 31 bits the
    * candidate-pair dedup below groups on ONE packed long instead of
    * two (the distinct over millions of nearly-unique pairs is the
    * CPU-dominant aggregation of both LSH paths — profiled as
    * hashAgg_doAggregateWithKeys). */
  private def cappedCorpusSide(ranked: DataFrame, maxBucket: Int,
                               tag: String): (DataFrame, Boolean) = {
    val g = ranked.agg(
      sum(when(col("rn") > maxBucket, 1L).otherwise(0L)).as("nDropped"),
      max(col("id")).as("maxId"), min(col("id")).as("minId")).head()
    val nDropped = if (g.isNullAt(0)) 0L else g.getLong(0)
    if (nDropped > 0)
      println(s"[$tag] dropped $nDropped bucket members over cap=$maxBucket")
    val packable = !g.isNullAt(1) && !g.isNullAt(2) &&
      g.getLong(2) >= 0L && g.getLong(1) < (1L << 31)
    (ranked.filter(col("rn") <= maxBucket), packable)
  }

  /** Distinct over (a, b) id pairs, via one packed 62-bit key when the
    * id range allows (bit-identical result either way). */
  private def distinctPairs(df: DataFrame, a: String, b: String,
                            packable: Boolean): DataFrame =
    if (packable)
      df.select((shiftleft(col(a), 32) + col(b)).as("pk"))
        .distinct()
        .select(shiftright(col("pk"), 32).as(a),
          col("pk").bitwiseAND(lit(0x7fffffffL)).as(b))
    else df.select(a, b).distinct()

  /** LSH-bucketed approximate top-k over `corpus` (id, emb).
    *
    * nTables independent SRP tables of nPlanes bits each (signature
    * width = the embedding's runtime length; see [[srpSignature]]);
    * candidates share a (table, signature) bucket, where the QUERY
    * side also probes its hamming-1 signature neighborhood when
    * `probe` is set. Oversize buckets are truncated at `maxBucket`
    * members on the corpus side (deterministic by id; drops logged).
    * Candidates are then scored exactly (cosine with precomputed
    * norms) and ranked. */
  def lshTopK(corpus: DataFrame, k: Int,
              nPlanes: Int = 6, nTables: Int = 8,
              maxBucket: Int = 4096, probe: Boolean = true): DataFrame = {
    val ranked = rankedBucketAssignments(corpus, nPlanes, nTables)
    val (capped, packable) = cappedCorpusSide(ranked, maxBucket, "lshTopK")
    val corpusSide = capped
      .select(col("tbl"), col("sig"), col("id").as("neighbor_id"))

    // Query side: the exact signature plus its nPlanes hamming-1 probes.
    val probeSigs =
      if (!probe) array(col("sig"))
      else array(col("sig") +:
        (0 until nPlanes).map(j => col("sig").bitwiseXOR(lit(1L << j))): _*)
    val querySide = ranked
      .select(col("id").as("vec_id"), col("tbl"), explode(probeSigs).as("sig"))

    // Materialize the deduped candidate pairs, then release the cached
    // assignment table — repeated calls in one session (bench reps)
    // must not accumulate cached partitions.
    val cand = distinctPairs(
      querySide
        .join(corpusSide, Seq("tbl", "sig"))
        .filter(col("vec_id") =!= col("neighbor_id")),
      "vec_id", "neighbor_id", packable)
      .localCheckpoint(true)
    ranked.unpersist(false)

    // Exact scoring of candidates only (same float path as brute force).
    val nrm = corpus.select(col("id"), col("emb"), norm(col("emb")).as("n"))
    val scored = cand
      .join(nrm.select(col("id").as("vec_id"), col("emb").as("qe"), col("n").as("qn")), "vec_id")
      .join(nrm.select(col("id").as("neighbor_id"), col("emb").as("ce"), col("n").as("cn")), "neighbor_id")
      .withColumn("sim", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id")
  }

  /** Embedding-cosine near-duplicate pairs (sim >= tau), brute force. */
  def cosineNearDupPairs(corpus: DataFrame, tau: Double): DataFrame = {
    val a = corpus.select(col("id").as("id1"), col("emb").as("e1"))
    val b = corpus.select(col("id").as("id2"), col("emb").as("e2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("sim", cosine(col("e1"), col("e2")))
      .filter(col("sim") >= tau)
      .select("id1", "id2", "sim")
  }

  /** LSH-bucketed embedding near-duplicate PAIRS — the scale path for
    * [[cosineNearDupPairs]], same shape as the MinHash-LSH text path
    * (candidates from bucket collisions, exact verification inline).
    * Candidate pairs are the unordered (id1 < id2) collisions within
    * any (table, SRP-signature) bucket after the deterministic
    * per-bucket cap (row_number by id, drops logged — the guard that
    * keeps a pathological hub bucket from going quadratic); each
    * candidate is then scored with the SAME double arithmetic as the
    * brute-force path and kept iff cosine >= tau. PRECISION is
    * therefore exact (every emitted pair is a true near-dup pair);
    * recall is the usual LSH function of tau/nPlanes/nTables
    * (spec-asserted on the fixture). Never an all-pairs join: work is
    * bounded by sum of capped-bucket-size², corpus-shuffle keys are
    * the 8-byte (tbl, sig) pair. */
  def lshNearDupPairs(corpus: DataFrame, tau: Double,
                      nPlanes: Int = 6, nTables: Int = 8,
                      maxBucket: Int = 4096): DataFrame = {
    val ranked = rankedBucketAssignments(corpus, nPlanes, nTables)
    val (capped, packable) = cappedCorpusSide(ranked, maxBucket, "lshNearDupPairs")
    // a pair colliding in several tables verifies once (packed distinct)
    val cand = distinctPairs(
      capped.select(col("tbl"), col("sig"), col("id").as("id1"))
        .join(capped.select(col("tbl"), col("sig"), col("id").as("id2")),
          Seq("tbl", "sig"))
        .filter(col("id1") < col("id2")),
      "id1", "id2", packable)
      .localCheckpoint(true)
    ranked.unpersist(false)
    val nrm = corpus.select(col("id"), col("emb"), norm(col("emb")).as("n"))
    cand
      .join(nrm.select(col("id").as("id1"), col("emb").as("e1"), col("n").as("n1")), "id1")
      .join(nrm.select(col("id").as("id2"), col("emb").as("e2"), col("n").as("n2")), "id2")
      .filter(dot(col("e1"), col("e2")) / (col("n1") * col("n2")) >= tau)
      .select("id1", "id2")
  }
}
