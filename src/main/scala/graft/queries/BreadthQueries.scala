package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.Corpus
import graft.queries.CoreQueries.tune

/** Breadth blocks 3 + 4 (round 4): thirteen further KG edge families
  * toward the reference's ~40 edge types (schema_config.yaml:208-606 —
  * e.g. drug_interacts_with_drug, disease_comorbid_with, side-effect
  * and orthology tables), each re-expressed over the driver tables as
  * a DISTINCT operator shape and each fully DuckDB-oracle-checked:
  *   shares_part        bounded co-occurrence pairs (supplier–supplier)
  *   co_purchased_with  thresholded co-occurrence (order–order)
  *   cites              content-derived-key self join (doc–doc)
  *   touched            JSON-prop extraction + agg (user–doc)
  *   peer_of            cohort path graph via lag window (cust–cust)
  *   next_order         windowed succession + date gap (order–order)
  *   returned           filtered multi-hop + canonicalize (cust–part)
  *   ships_to           multi-hop countDistinct agg (supp–nation)
  *   similar_to         SimHash hamming pairs as edges (doc–doc)
  *   followed_by        Markov event transitions via lag (evt–evt)
  *   located_in_region  2-hop dimension rollup (cust–region)
  *   best_supplied_by   top-1-per-group as an edge (part–supp)
  *   closest_part       exact cosine NN between node embeddings
  */
object BreadthQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shares_part" -> ((s, dir) => {
      tune(s)
      Corpus.sharesPartEdges(s, dir, Corpus.canonicalIds(s, dir))
    }),
    "q_co_purchased" -> ((s, dir) => {
      tune(s)
      Corpus.coPurchasedEdges(s, dir)
    }),
    "q_cites" -> ((s, dir) => {
      tune(s)
      Corpus.citesEdges(s, dir)
    }),
    "q_touched" -> ((s, dir) => {
      tune(s)
      Corpus.touchedEdges(s, dir)
    }),
    "q_peer_of" -> ((s, dir) => {
      tune(s)
      Corpus.peerOfEdges(s, dir)
    }),
    "q_next_order" -> ((s, dir) => {
      tune(s)
      Corpus.nextOrderEdges(s, dir)
    }),
    "q_returned" -> ((s, dir) => {
      tune(s)
      Corpus.returnedEdges(s, dir, Corpus.canonicalIds(s, dir))
    }),
    "q_ships_to" -> ((s, dir) => {
      tune(s)
      Corpus.shipsToEdges(s, dir)
    }),
    // Breadth block 4.
    "q_similar_to" -> ((s, dir) => {
      tune(s)
      Corpus.similarToEdges(s, dir)
    }),
    "q_followed_by" -> ((s, dir) => {
      tune(s)
      Corpus.followedByEdges(s, dir)
    }),
    "q_located_region" -> ((s, dir) => {
      tune(s)
      Corpus.locatedInRegionEdges(s, dir)
    }),
    "q_best_supplier" -> ((s, dir) => {
      tune(s)
      Corpus.bestSupplierEdges(s, dir, Corpus.canonicalIds(s, dir))
    }),
    "q_closest_part" -> ((s, dir) => {
      tune(s)
      Corpus.closestPartEdges(s, dir)
    })
  )

  /** Canonical-part CTE shared by the part-canonicalized oracles. */
  private val pcSql =
    """pc AS (
      |  SELECT p_partkey,
      |         'PART:' || replace(min('PARTRAW:' || p_partkey) OVER (PARTITION BY p_name), 'PARTRAW:', '') AS pid
      |  FROM part)""".stripMargin

  /** DuckDB mirror of TextOps.fingerprint over string_split tokens
    * (same integer fold as the q_doc_fingerprint oracle). */
  private val fpSql =
    """list_reduce([0] || list_transform(string_split(text, ' '),
      |    t -> (ord(t[1])*7 + length(t)) % 1048576),
      |    (a,b) -> (a*31+b) % 1048576)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // Both co-occurrence oracles model the engine's bounded-posting df
    // cap (CoOccurrenceMaxDf = 65536): items hotter than the cap leave
    // the pair universe — same modeling as the ngram maxDf oracle.
    "q_shares_part" ->
      s"""WITH $pcSql,
         |sp AS (
         |  SELECT DISTINCT l.l_suppkey sk, pc.pid
         |  FROM lineitem l JOIN pc ON pc.p_partkey = l.l_partkey),
         |spf AS (
         |  SELECT sk, pid FROM (
         |    SELECT sk, pid, count(*) OVER (PARTITION BY pid) df FROM sp)
         |  WHERE df <= 65536)
         |SELECT 'SUPP:'||a.sk subject_id, 'shares_part' relation_label,
         |       'SUPP:'||b.sk object_id, CAST(count(*) AS BIGINT) n_common
         |FROM spf a JOIN spf b ON a.pid = b.pid AND a.sk < b.sk
         |GROUP BY 1, 2, 3""".stripMargin,
    "q_co_purchased" ->
      """WITH op AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |opf AS (
        |  SELECT ok, pk FROM (
        |    SELECT ok, pk, count(*) OVER (PARTITION BY pk) df FROM op)
        |  WHERE df <= 65536)
        |SELECT 'ORDER:'||a.ok subject_id, 'co_purchased_with' relation_label,
        |       'ORDER:'||b.ok object_id, CAST(count(*) AS BIGINT) n_common
        |FROM opf a JOIN opf b ON a.pk = b.pk AND a.ok < b.ok
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2""".stripMargin,
    "q_cites" ->
      s"""WITH f AS (
         |  SELECT doc_id, $fpSql fp,
         |         (SELECT count(*) FROM documents) n
         |  FROM documents)
         |SELECT 'DOC:'||doc_id subject_id, 'cites' relation_label,
         |       'DOC:'||(fp % n) object_id, fp
         |FROM f WHERE fp % n <> doc_id""".stripMargin,
    "q_touched" ->
      """SELECT 'USER:'||e.user_id subject_id, 'touched' relation_label,
        |       'DOC:'||e.k object_id,
        |       CAST(count(*) AS BIGINT) n_events,
        |       CAST(sum(CAST(floor(e."value"*1000+0.5) AS BIGINT)) AS BIGINT) value_milli
        |FROM (SELECT user_id,
        |             CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) k,
        |             "value"
        |      FROM events) e
        |JOIN documents d ON d.doc_id = e.k
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_peer_of" ->
      """SELECT 'CUST:'||prev subject_id, 'peer_of' relation_label,
        |       'CUST:'||c_custkey object_id
        |FROM (SELECT c_custkey,
        |             lag(c_custkey) OVER (PARTITION BY c_nationkey, c_mktsegment
        |                                  ORDER BY c_custkey) prev
        |      FROM customer)
        |WHERE prev IS NOT NULL""".stripMargin,
    "q_next_order" ->
      """SELECT 'ORDER:'||pk subject_id, 'next_order' relation_label,
        |       'ORDER:'||o_orderkey object_id,
        |       CAST(datediff('day', CAST(pd AS DATE), CAST(o_orderdate AS DATE)) AS BIGINT) gap_days
        |FROM (SELECT o_orderkey, o_orderdate,
        |             lag(o_orderkey) OVER w pk,
        |             lag(o_orderdate) OVER w pd
        |      FROM orders
        |      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |WHERE pk IS NOT NULL""".stripMargin,
    "q_returned" ->
      s"""WITH $pcSql
         |SELECT 'CUST:'||o.o_custkey subject_id, 'returned' relation_label,
         |       pc.pid object_id,
         |       CAST(count(*) AS BIGINT) n_returns,
         |       CAST(sum(CAST(floor(l.l_quantity*1000+0.5) AS BIGINT)) AS BIGINT) qty_milli
         |FROM lineitem l
         |JOIN orders o ON o.o_orderkey = l.l_orderkey
         |JOIN pc ON pc.p_partkey = l.l_partkey
         |WHERE l.l_returnflag = 'R'
         |GROUP BY 1, 2, 3""".stripMargin,
    "q_ships_to" ->
      """SELECT 'SUPP:'||l.l_suppkey subject_id, 'ships_to' relation_label,
        |       'NATION:'||c.c_nationkey object_id,
        |       CAST(count(DISTINCT l.l_orderkey) AS BIGINT) n_orders
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_similar_to" ->
      s"""SELECT 'DOC:'||id1 subject_id, 'similar_to' relation_label,
         |       'DOC:'||id2 object_id, hamming
         |FROM (${TextQueries.simhashSqlOver("SELECT doc_id, text FROM documents")})""".stripMargin,
    "q_followed_by" ->
      """SELECT 'EVT:'||prev subject_id, 'followed_by' relation_label,
        |       'EVT:'||event_type object_id, CAST(count(*) AS BIGINT) n_times
        |FROM (SELECT event_type,
        |             lag(event_type) OVER (PARTITION BY user_id
        |                                   ORDER BY ts, event_id) prev
        |      FROM events)
        |WHERE prev IS NOT NULL GROUP BY 1, 2, 3""".stripMargin,
    "q_located_region" ->
      """SELECT 'CUST:'||c.c_custkey subject_id,
        |       'located_in_region' relation_label,
        |       'REGION:'||n.n_regionkey object_id
        |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey""".stripMargin,
    "q_best_supplier" ->
      s"""WITH $pcSql,
         |agg AS (
         |  SELECT pc.pid, l.l_suppkey,
         |         CAST(sum(CAST(floor(l.l_quantity*1000+0.5) AS BIGINT)) AS BIGINT) qty_milli
         |  FROM lineitem l JOIN pc ON pc.p_partkey = l.l_partkey
         |  GROUP BY 1, 2)
         |SELECT pid subject_id, 'best_supplied_by' relation_label,
         |       'SUPP:'||l_suppkey object_id, qty_milli
         |FROM (SELECT pid, l_suppkey, qty_milli,
         |             row_number() OVER (PARTITION BY pid
         |               ORDER BY qty_milli DESC, l_suppkey) rn
         |      FROM agg)
         |WHERE rn = 1""".stripMargin,
    "q_closest_part" ->
      """WITH mk AS (
        |  SELECT CAST(replace(min('PARTRAW:' || p_partkey), 'PARTRAW:', '') AS BIGINT) minkey
        |  FROM part GROUP BY p_name),
        |ce AS (
        |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) emb
        |  FROM embeddings e JOIN mk ON mk.minkey = e.vec_id)
        |SELECT 'PART:'||vec_id subject_id, 'closest_to' relation_label,
        |       'PART:'||neighbor_id object_id
        |FROM (
        |  SELECT a.vec_id, b.vec_id neighbor_id,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.emb, b.emb) DESC, b.vec_id) rn
        |  FROM ce a JOIN ce b ON b.vec_id <> a.vec_id)
        |WHERE rn = 1""".stripMargin
  )
}