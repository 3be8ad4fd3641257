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
    "q_knn_lsh" -> ((s, dir) => {
      tune(s)
      Knn.lshTopK(emb(s, dir), dim = 64, nPlanes = 8, k = 5)
    }),
    "q_cosine_neardup" -> ((s, dir) => {
      tune(s)
      // integer outputs only (sim column would be float-eps fragile)
      Knn.cosineNearDupPairs(emb(s, dir), tau = 0.30).select("id1", "id2")
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

  val oracleSql: Map[String, String] = Map(
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
