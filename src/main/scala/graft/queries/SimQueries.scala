package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.Corpus
import graft.sim.Knn
import graft.queries.CoreQueries.tune

/** Similarity-search queries over the `embeddings` table (64-dim
  * Array[Float]). Brute-force cosine top-k is oracle-checked (double
  * arithmetic, deterministic tie-break); the LSH-bucketed variant is
  * rows-only (recall asserted against brute force in ScalaTest).
  */
object SimQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Corpus.table(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_cosine" -> ((s, dir) => {
      tune(s)
      val corpus = emb(s, dir)
      val queriesDf = corpus.filter(pmod(col("id"), lit(5)) === 0)
      Knn.bruteForceTopK(queriesDf, corpus, k = 5)
    }),
    // Multi-table SRP LSH with hamming-1 probes — now fully oracle-
    // checked: the signature arithmetic is integer-mix coefficients +
    // exact power-of-two division, reproduced verbatim in DuckDB.
    "q_knn_lsh" -> ((s, dir) => {
      tune(s)
      Knn.lshTopK(emb(s, dir), k = 5,
        nPlanes = 6, nTables = 8, maxBucket = 4096, probe = true)
    }),
    // IVF ANN with FIXED deterministic centroids (the "trained offline,
    // shipped with the job" deployment shape — a 10^12-row corpus never
    // re-trains its quantizer per query): assignment, the maxList cap,
    // nprobe probing and exact scoring are all integer-mix + sequential
    // double-fold arithmetic, so the whole path is fully oracle-checked
    // in DuckDB (centroid j, dim d from the same public formula). The
    // TRAINED path (Lloyd rounds, float-sum order-dependent) stays
    // recall-gated >= 0.8 vs brute force in ScalaTest (DedupSimSpec).
    "q_knn_ivf" -> ((s, dir) => {
      tune(s)
      graft.sim.Ivf.ivfTopK(emb(s, dir), dim = 64, k = 5,
        nprobe = IvfNprobe, maxList = IvfMaxList,
        centroids = Some(graft.sim.Ivf.fixedCentroids(IvfC, 64)))
    }),
    // IVF-SQ8: the SAME fixed-centroid coarse probe as q_knn_ivf,
    // candidates re-scored with the int8-quantized cosine (exact
    // integer dots) — 64 B/vector, the FAISS SQ8 deployment shape.
    "q_knn_sq8" -> ((s, dir) => {
      tune(s)
      graft.sim.Quant.ivfTopKSq8(emb(s, dir), k = 5,
        nprobe = IvfNprobe, maxList = IvfMaxList,
        centroids = graft.sim.Ivf.fixedCentroids(IvfC, 64))
    }),
    // IVF-PQ: coarse probe + asymmetric-distance scoring against
    // 8-byte product-quantizer codes (closed-form codebooks — the
    // trained-offline artifact shape) — THE public 10^12-vector ANN
    // design, fully oracle-checked.
    "q_knn_pq" -> ((s, dir) => {
      tune(s)
      graft.sim.Quant.ivfTopKPq(emb(s, dir), k = 5,
        nprobe = IvfNprobe, maxList = IvfMaxList,
        centroids = graft.sim.Ivf.fixedCentroids(IvfC, 64))
    }),
    "q_cosine_neardup" -> ((s, dir) => {
      tune(s)
      // integer outputs only (sim column would be float-eps fragile)
      Knn.cosineNearDupPairs(emb(s, dir), tau = 0.30).select("id1", "id2")
    }),
    // The SCALE path for the same operation: SRP-bucketed candidate
    // pairs + exact cosine verify — never an all-pairs join. Fully
    // oracle-checked (bucketing, cap, and verify arithmetic reproduced
    // in DuckDB); recall vs the exact baseline is spec-asserted.
    "q_cosine_neardup_lsh" -> ((s, dir) => {
      tune(s)
      Knn.lshNearDupPairs(emb(s, dir), tau = 0.30,
        nPlanes = 6, nTables = 8, maxBucket = 4096)
    }),
    // SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup —
    // nearest-fixed-centroid assignment bounds the pair search the way
    // LSH buckets do, and each duplicate pair keeps the member FARTHER
    // from its centroid. Assignment, cluster cap, threshold and keep
    // rule are all integer/sequential-double arithmetic: fully
    // oracle-checked (the cap is exercised at sf0.01: 500 vecs / 16
    // clusters vs cap 24).
    "q_semdedup" -> ((s, dir) => {
      tune(s)
      graft.sim.SemDedup.semDedup(emb(s, dir),
        c = SemC, dim = 64, tau = SemTau, maxCluster = SemMaxCluster)
    }),
    // S4: embedding scan with validity filter (reference: keep iff
    // count_nonzero(~isnan)==dim, uniprot_adapter.py:384-422).
    "q_embedding_valid" -> ((s, dir) => {
      tune(s)
      Corpus.table(s, dir, "embeddings")
        .filter(size(col("embedding")) === 64 &&
          !exists(col("embedding"), x => isnan(x)))
        .select("vec_id", "label")
    })
  )

  /** q_knn_ivf parameters, shared by the query and its oracle SQL. */
  private val IvfC = 16
  private val IvfNprobe = 4
  private val IvfMaxList = 4096

  /** q_semdedup parameters, shared by the query and its oracle SQL. */
  private val SemC = 16
  private val SemTau = 0.30
  private val SemMaxCluster = 24

  /** DuckDB mirror of SemDedup.semDedup: the same fixed-centroid
    * assignment arms as [[ivfCandCtes]], the deterministic cluster cap,
    * the within-cluster pair threshold, and the keep-farther-from-
    * centroid rule — the centroid-similarity comparand rebuilt with the
    * identical closed-form centroid (cid as a column inside the
    * formula) and the identical sequential double fold. */
  private val semDedupSql: String = {
    val dim = 64
    def distSql(j: Int): String = {
      val off = j * 40503L
      val cent = s"((d * 2654435761 + $off) % 1048576 / 524288.0 - 1.0)"
      s"list_reduce([0.0] || list_transform(generate_series(1, $dim), " +
        s"d -> (e[d] - $cent) * (e[d] - $cent)), (a, b) -> a + b)"
    }
    val centDot =
      s"list_reduce([0.0] || list_transform(generate_series(1, $dim), " +
        s"d -> e[d] * ((d * 2654435761 + cid * 40503) % 1048576 / 524288.0 - 1.0)), " +
        "(x, y) -> x + y)"
    val arms = (1 to SemC).map(j =>
      s"SELECT vec_id, $j j, ${distSql(j)} dist FROM c")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |dd AS (
       |  $arms),
       |pr AS (
       |  SELECT vec_id, j,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) rn
       |  FROM dd),
       |asg AS (
       |  SELECT vec_id, j cid,
       |         row_number() OVER (PARTITION BY j ORDER BY vec_id) lrn
       |  FROM pr WHERE rn = 1),
       |capped AS (
       |  SELECT a.cid, a.vec_id, c.e,
       |         $centDot / sqrt(${dotSql("e", "e", dim)}) cs
       |  FROM asg a JOIN c ON c.vec_id = a.vec_id
       |  WHERE a.lrn <= $SemMaxCluster),
       |drops AS (
       |  SELECT DISTINCT CASE WHEN a.cs > b.cs THEN a.vec_id
       |                       ELSE b.vec_id END id
       |  FROM capped a JOIN capped b
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.e, b.e) >= $SemTau)
       |SELECT vec_id AS id, cid FROM asg
       |WHERE vec_id NOT IN (SELECT id FROM drops)""".stripMargin
  }

  /** DuckDB mirror of Knn.srpSignature for table `t`: per plane p the
    * projection is an ORDERED left-fold sum (list_reduce seeded [0.0] =
    * Spark's aggregate seeded 0.0), coefficients the same integer mix +
    * exact /2^19 — bit-identical sign bits in both engines. */
  private def lshSigSql(dim: Int, nPlanes: Int, t: Int): String =
    (0 until nPlanes).map { p =>
      val off = (p + t * nPlanes + 1) * 40503L
      s"(CASE WHEN list_reduce([0.0] || list_transform(generate_series(1, $dim), " +
        s"d -> e[d] * ((d * 2654435761 + $off) % 1048576 / 524288.0 - 1.0)), " +
        s"(a, b) -> a + b) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  private def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce([0.0] || list_transform(generate_series(1, $dim), " +
      s"i -> $a[i] * $b[i]), (x, y) -> x + y)"

  /** Shared oracle scaffolding for BOTH LSH paths — the embeddings
    * CTE, the nTables signature arms, and the per-bucket cap (mirror
    * of Knn.rankedBucketAssignments + cappedCorpusSide). One builder,
    * so the cap/ordering semantics cannot drift between the two
    * oracles; the cap is modeled, never assumed away. */
  private def lshCorpCtes(dim: Int, nPlanes: Int, nTables: Int,
                          maxBucket: Int): String = {
    val sigArms = (0 until nTables).map(t =>
      s"SELECT vec_id, $t tbl, ${lshSigSql(dim, nPlanes, t)} sig FROM c")
      .mkString("\n  UNION ALL\n  ")
    s"""c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |sigs AS (
       |  $sigArms),
       |corp AS (
       |  SELECT vec_id, tbl, sig FROM (
       |    SELECT vec_id, tbl, sig,
       |           row_number() OVER (PARTITION BY tbl, sig ORDER BY vec_id) rn
       |    FROM sigs) WHERE rn <= $maxBucket)""".stripMargin
  }

  private val knnLshSql: String = {
    val dim = 64; val k = 5; val nPlanes = 6; val nTables = 8; val maxBucket = 4096
    val probeList = ("sig" +: (0 until nPlanes).map(j => s"xor(sig, ${1L << j})"))
      .mkString("[", ", ", "]")
    s"""WITH ${lshCorpCtes(dim, nPlanes, nTables, maxBucket)},
       |probes AS (
       |  SELECT vec_id, tbl, unnest($probeList) psig FROM sigs),
       |cand AS (
       |  SELECT DISTINCT p.vec_id, s.vec_id neighbor_id
       |  FROM probes p JOIN corp s
       |    ON s.tbl = p.tbl AND s.sig = p.psig AND s.vec_id <> p.vec_id),
       |scored AS (
       |  SELECT cd.vec_id, cd.neighbor_id,
       |    ${dotSql("q.e", "a.e", dim)}
       |      / (sqrt(${dotSql("q.e", "q.e", dim)})
       |         * sqrt(${dotSql("a.e", "a.e", dim)})) sim
       |  FROM cand cd JOIN c q ON q.vec_id = cd.vec_id
       |  JOIN c a ON a.vec_id = cd.neighbor_id)
       |SELECT vec_id, rank, neighbor_id FROM (
       |  SELECT vec_id, neighbor_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY sim DESC, neighbor_id) rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin
  }

  /** Shared oracle scaffolding for ALL THREE IVF paths (exact, SQ8,
    * PQ-ADC): embeddings CTE, centroid-distance arms, first-min list
    * assignment, the maxList cap and the nprobe probe — the mirror of
    * Ivf.ivfCandidates. The squared-L2 distance to centroid j is the
    * SAME sequential double fold as the native CentroidDists kernel
    * (seed 0.0, term order d = 1..dim, centroid value = exact integer
    * mix / 2^19 − 1); assignment is the first minimum (ORDER BY dist,
    * j), lists are capped at maxList by (cid, neighbor_id) row_number.
    * One builder, so the probe semantics cannot drift between the
    * three oracles. */
  private def ivfCandCtes(dim: Int): String = {
    def distSql(j: Int): String = {
      val off = j * 40503L
      val cent = s"((d * 2654435761 + $off) % 1048576 / 524288.0 - 1.0)"
      s"list_reduce([0.0] || list_transform(generate_series(1, $dim), " +
        s"d -> (e[d] - $cent) * (e[d] - $cent)), (a, b) -> a + b)"
    }
    val arms = (1 to IvfC).map(j =>
      s"SELECT vec_id, $j j, ${distSql(j)} dist FROM c")
      .mkString("\n  UNION ALL\n  ")
    s"""c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |dd AS (
       |  $arms),
       |pr AS (
       |  SELECT vec_id, j,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) rn
       |  FROM dd),
       |lists AS (
       |  SELECT cid, vec_id neighbor_id FROM (
       |    SELECT a.cid, a.vec_id,
       |           row_number() OVER (PARTITION BY a.cid ORDER BY a.vec_id) lrn
       |    FROM (SELECT vec_id, j cid FROM pr WHERE rn = 1) a)
       |  WHERE lrn <= $IvfMaxList),
       |probes AS (SELECT vec_id, j cid FROM pr WHERE rn <= $IvfNprobe),
       |cand AS (
       |  SELECT DISTINCT p.vec_id, l.neighbor_id
       |  FROM probes p JOIN lists l
       |    ON l.cid = p.cid AND l.neighbor_id <> p.vec_id)""".stripMargin
  }

  /** DuckDB mirror of Ivf.ivfTopK over fixed formula centroids:
    * [[ivfCandCtes]] candidates scored with the identical dot/norm
    * arithmetic as the LSH oracle. */
  private val knnIvfSql: String = {
    val dim = 64; val k = 5
    s"""WITH ${ivfCandCtes(dim)},
       |scored AS (
       |  SELECT cd.vec_id, cd.neighbor_id,
       |    ${dotSql("q.e", "a.e", dim)}
       |      / (sqrt(${dotSql("q.e", "q.e", dim)})
       |         * sqrt(${dotSql("a.e", "a.e", dim)})) sim
       |  FROM cand cd JOIN c q ON q.vec_id = cd.vec_id
       |  JOIN c a ON a.vec_id = cd.neighbor_id)
       |SELECT vec_id, rank, neighbor_id FROM (
       |  SELECT vec_id, neighbor_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY sim DESC, neighbor_id) rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin
  }

  /** DuckDB mirror of Quant.ivfTopKSq8: the same [[ivfCandCtes]]
    * probe, candidates scored with the int8-quantized cosine — the
    * floor-based rounding rule and the EXACT integer dot reproduce in
    * any engine (sum order irrelevant on integers), and the only
    * doubles are two sqrt's and one division, IEEE-identical. */
  private val knnSq8Sql: String = {
    val dim = 64; val k = 5
    def intDotSql(a: String, b: String): String =
      s"list_reduce([CAST(0 AS BIGINT)] || list_transform(generate_series(1, $dim), " +
        s"i -> $a[i]*$b[i]), (x, y) -> x + y)"
    s"""WITH ${ivfCandCtes(dim)},
       |qz AS (
       |  SELECT vec_id,
       |         list_transform(e, x -> CAST(greatest(least(floor(x*127.0 + 0.5), 127), -127) AS BIGINT)) z
       |  FROM c),
       |zn AS (SELECT vec_id, z, ${intDotSql("z", "z")} sd FROM qz),
       |scored AS (
       |  SELECT cd.vec_id, cd.neighbor_id,
       |    CAST(${intDotSql("q.z", "a.z")} AS DOUBLE) / (sqrt(q.sd) * sqrt(a.sd)) sim
       |  FROM cand cd JOIN zn q ON q.vec_id = cd.vec_id
       |  JOIN zn a ON a.vec_id = cd.neighbor_id)
       |SELECT vec_id, rank, neighbor_id FROM (
       |  SELECT vec_id, neighbor_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY sim DESC, neighbor_id) rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin
  }

  /** DuckDB mirror of Quant.ivfTopKPq: [[ivfCandCtes]] probe, PQ
    * encoding as the per-(vec, subspace) first-min codeword over the
    * closed-form codebook (the CentroidDists fold, seed 0.0, d
    * sequential), ADC scoring as the same fold over all 64 dims with
    * the codebook value reconstructed from the neighbor's code. */
  private val knnPqSql: String = {
    val dim = 64; val k = 5
    val m = graft.sim.Quant.PqM; val ks = graft.sim.Quant.PqKs
    val sub = graft.sim.Quant.PqSubDim
    def cbSql(gdExpr: String, jExpr: String): String =
      s"(($gdExpr * 2654435761 + $jExpr * 40503) % 1048576 / 524288.0 - 1.0)"
    val subDiff = s"(c.e[g1.m*$sub+dl] - ${cbSql(s"(g1.m*$sub+dl)", "g2.j")})"
    val adcDiff = s"(q.e[gd] - ${cbSql("gd", s"a.pc[((gd-1)//$sub)+1]")})"
    s"""WITH ${ivfCandCtes(dim)},
       |pd AS (
       |  SELECT c.vec_id, g1.m, g2.j,
       |    list_reduce([0.0] || list_transform(generate_series(1, $sub),
       |      dl -> $subDiff * $subDiff), (x, y) -> x + y) dist
       |  FROM c, generate_series(0, ${m - 1}) g1(m), generate_series(1, $ks) g2(j)),
       |pcodes AS (
       |  SELECT vec_id, list(j ORDER BY m) pc FROM (
       |    SELECT vec_id, m, j,
       |           row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, j) rn
       |    FROM pd) WHERE rn = 1 GROUP BY vec_id),
       |scored AS (
       |  SELECT cd.vec_id, cd.neighbor_id,
       |    list_reduce([0.0] || list_transform(generate_series(1, $dim),
       |      gd -> $adcDiff * $adcDiff), (x, y) -> x + y) dist
       |  FROM cand cd JOIN c q ON q.vec_id = cd.vec_id
       |  JOIN pcodes a ON a.vec_id = cd.neighbor_id)
       |SELECT vec_id, rank, neighbor_id FROM (
       |  SELECT vec_id, neighbor_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY dist, neighbor_id) rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin
  }

  /** DuckDB mirror of Knn.lshNearDupPairs: same signature arithmetic
    * and per-bucket cap as knnLshSql, candidates = within-bucket
    * unordered collisions, verify = the identical exact-fold cosine
    * compared to tau. The cap is modeled, not assumed away. */
  private val cosineNearDupLshSql: String = {
    val dim = 64; val nPlanes = 6; val nTables = 8; val maxBucket = 4096
    val tau = "0.30"
    s"""WITH ${lshCorpCtes(dim, nPlanes, nTables, maxBucket)},
       |cand AS (
       |  SELECT DISTINCT a.vec_id id1, b.vec_id id2
       |  FROM corp a JOIN corp b
       |    ON b.tbl = a.tbl AND b.sig = a.sig AND a.vec_id < b.vec_id)
       |SELECT cd.id1, cd.id2
       |FROM cand cd JOIN c q ON q.vec_id = cd.id1
       |JOIN c a ON a.vec_id = cd.id2
       |WHERE ${dotSql("q.e", "a.e", dim)}
       |      / (sqrt(${dotSql("q.e", "q.e", dim)})
       |         * sqrt(${dotSql("a.e", "a.e", dim)})) >= $tau""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_knn_lsh" -> knnLshSql,
    "q_cosine_neardup_lsh" -> cosineNearDupLshSql,
    "q_semdedup" -> semDedupSql,
    "q_knn_ivf" -> knnIvfSql,
    "q_knn_sq8" -> knnSq8Sql,
    "q_knn_pq" -> knnPqSql,
    "q_knn_cosine" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
        |q AS (SELECT * FROM c WHERE vec_id % 5 = 0)
        |SELECT vec_id, rank, neighbor_id FROM (
        |  SELECT q.vec_id, a.vec_id neighbor_id,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY list_cosine_similarity(q.e, a.e) DESC, a.vec_id ASC) rank
        |  FROM q JOIN c a ON a.vec_id <> q.vec_id)
        |WHERE rank <= 5""".stripMargin,
    "q_cosine_neardup" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings)
        |SELECT a.vec_id id1, b.vec_id id2
        |FROM c a JOIN c b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.e, b.e) >= 0.30""".stripMargin,
    "q_embedding_valid" ->
      """SELECT vec_id, label FROM embeddings
        |WHERE len(embedding) = 64
        |  AND len(list_filter(embedding, x -> isnan(x))) = 0""".stripMargin
  )
}
