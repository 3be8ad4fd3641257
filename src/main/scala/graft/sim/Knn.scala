package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: LSH-bucketed
  * variant using deterministic random-hyperplane signatures — candidates
  * come from an equi-join on bucket signature, so the quadratic blowup is
  * bounded per bucket; at 100 TB the bucketed table is written
  * pre-partitioned by signature and probes never shuffle the corpus.
  */
object Knn {

  /** dot(a,b) computed in double, sequential left fold (deterministic
    * summation order — oracle-comparable). */
  def dot(a: Column, b: Column): Column =
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
    * dimension d): a fixed integer mix mapped to [-1, 1). */
  private def coeff(p: Int, d: Column): Column = {
    val mixed = pmod(
      (d + 1) * lit(2654435761L) + lit((p + 1) * 40503L), lit(1048576L))
    mixed.cast("double") / lit(524288.0) - 1.0
  }

  /** Sign-random-projection bucket signature (nPlanes bits) per vector —
    * the LSH/IVF-style coarse quantizer. */
  def srpSignature(emb: Column, dim: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = (0 until dim).map(d =>
        element_at(emb, d + 1).cast("double") * coeff(p, lit(d))).reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k: candidates share the SRP bucket,
    * then exact cosine + window top-k inside the candidate set. */
  def lshTopK(corpus: DataFrame, dim: Int, nPlanes: Int, k: Int): DataFrame = {
    val sigged = corpus.select(col("id"), col("emb"),
      srpSignature(col("emb"), dim, nPlanes).as("sig"))
    val cand = sigged.alias("a").join(sigged.alias("b"),
        col("a.sig") === col("b.sig") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("vec_id"), col("b.id").as("neighbor_id"),
        cosine(col("a.emb"), col("b.emb")).as("sim"))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
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
}
