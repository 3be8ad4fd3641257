package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.canon.Canonicalize

/** Triple extraction (north-rule stage 3): page-level co-mention rules
  * emit (subject_id, relation_label, object_id) in the reference's
  * adapter edge-tuple schema (SURVEY.md §1.1, ppi_adapter.py:1268-1303),
  * then both endpoints are canonicalized via the broadcast mapping table
  * and the result is set-deduplicated.
  *
  * Relation rules over the synthetic corpus:
  *   customer-mention × product-mention on the same page → (cust, ordered, part)
  *   customer-mention × nation-mention  on the same page → (cust, located_in, nation)
  *
  * Scale: mentions are already partitioned by the page scan; the
  * same-page co-mention join is an equi-join on url (AQE-skew-safe:
  * pages have bounded mention counts), and canonicalization is
  * broadcast — no large shuffle besides the final distinct.
  */
object Triples {

  /** Scale shape shared by [[extract]] and [[extractEvidence]]: ONE
    * scan of the (10^12-page-proportional) mentions table, canonical
    * ids applied map-side as a broadcast join over 8-byte hashed keys,
    * then ONE shuffle grouping by hashed url — the per-page entity sets
    * are tiny, so the relation cross-product explodes map-side after
    * the group. Shuffling hashes instead of url/entity strings cut the
    * stage's CPU several-fold (measured); canonical strings are
    * restored at the end via the broadcast dimension.
    *
    * (xxhash64 key space: a pair collision among E entities / U urls
    * has probability ~E²/2^65 — negligible at any realistic dictionary
    * and corpus size.)
    *
    * Output: (u, url, cs, ps, ns) — canonical-hash sets per page.
    * Public so the pipeline can commit it ONCE and feed both
    * [[extractFromSets]] and [[evidenceFromSets]] (the triple and edge
    * stages would otherwise each re-scan and re-group the mentions). */
  def perPageEntitySets(mentions: DataFrame, canon: DataFrame): DataFrame = {
    val cmap = broadcast(Canonicalize.rank1(canon).select(
      xxhash64(col("raw_id")).as("e"),
      xxhash64(col("canonical_id")).as("ce")))
    mentions
      .select(xxhash64(col("url")).as("u"), col("url"),
        xxhash64(col("entity_id")).as("e"), col("entity_label").as("l"))
      .join(cmap, "e")
      .groupBy("u")
      .agg(
        min(col("url")).as("url"),
        collect_set(when(col("l") === "customer", col("ce"))).as("cs"),
        collect_set(when(col("l") === "product", col("ce"))).as("ps"),
        collect_set(when(col("l") === "nation", col("ce"))).as("ns"))
  }

  /** Map-side relation cross-product: (subject, rel, object) hash rows
    * from one page's entity sets. Two codegen'd explodes instead of the
    * nested transform/flatten/explode HOF chain: higher-order-function
    * lambdas are interpreted row-at-a-time and the nested form also
    * materialized the |cs|·(|ps|+|ns|) struct array (plus its flatten
    * copy) per page before exploding it; `posexplode(concat(ps, ns))`
    * with a split-index label keeps the whole 4M-row generation inside
    * WholeStageCodegen with zero per-row array materialization beyond
    * the concat. Pair SET is identical (downstream aggregations are
    * order-insensitive: distinct / associative bounded top-K). */
  private def relationPairs(df: DataFrame): DataFrame =
    df.select(col("url"), explode(col("cs")).as("se"), col("ps"), col("ns"))
      .select(col("url"), col("se"), size(col("ps")).as("np"),
        posexplode(concat(col("ps"), col("ns"))).as(Seq("i", "oe")))
      .select(col("url"), col("se"),
        when(col("i") < col("np"), lit("ordered"))
          .otherwise(lit("located_in")).as("relation_label"),
        col("oe"))

  /** Broadcast canonical-hash -> canonical-id dimension. */
  private def canonDim(canon: DataFrame): DataFrame =
    Canonicalize.rank1(canon).select(col("canonical_id")).distinct()
      .select(xxhash64(col("canonical_id")).as("ce"), col("canonical_id"))

  def extract(mentions: DataFrame, canon: DataFrame): DataFrame =
    extractFromSets(perPageEntitySets(mentions, canon), canon)

  /** [[extract]] over precomputed per-page entity sets. */
  def extractFromSets(pageSets: DataFrame, canon: DataFrame): DataFrame = {
    // Second (and last) shuffle: distinct on 8-byte triple keys, with
    // map-side partial dedup collapsing duplicate pages' pairs.
    val keys = relationPairs(pageSets)
      .select("se", "relation_label", "oe").distinct()
    val dim = broadcast(canonDim(canon))
    keys
      .join(dim.select(col("ce").as("se"), col("canonical_id").as("subject_id")), "se")
      .join(dim.select(col("ce").as("oe"), col("canonical_id").as("object_id")), "oe")
      .select(col("subject_id"), col("relation_label"), col("object_id"))
  }

  /** Node emission: distinct canonical entities with label + name prop
    * (reference node tuple (id, label, props) — SURVEY.md §2.10).
    * Same hashed-key discipline as [[extract]]: the one wide aggregation
    * groups on the 8-byte canonical hash (+ label), never on entity-id
    * strings; a pre-distinct is unnecessary because min(name) already
    * collapses duplicates in the same shuffle. */
  def nodes(mentions: DataFrame, canon: DataFrame): DataFrame = {
    val cmap = broadcast(Canonicalize.rank1(canon).select(
      xxhash64(col("raw_id")).as("e"),
      xxhash64(col("canonical_id")).as("ce")))
    mentions
      .select(xxhash64(col("entity_id")).as("e"),
        col("entity_label").as("label"), col("alias").as("name"))
      .join(cmap, "e")
      .groupBy("ce", "label")
      .agg(min("name").as("name"))
      .join(broadcast(canonDim(canon)), "ce")
      .select(col("canonical_id").as("id"), col("label"),
        map(lit("name"), col("name")).as("props"))
  }

  /** Witness-list cap for edge evidence: well above any fixture-scale
    * fan-in (so small-SF oracles see the complete set), but a hard
    * bound — at 10^12 pages one popular edge must not OOM a reducer. */
  val DefaultEvidenceCap = 1024

  /** Salt-cell count for the two-phase hub-key evidence aggregation. */
  val DefaultEvidenceSalts = 8

  /** Corpus-size threshold at which the flagship pipeline engages the
    * salted two-phase evidence aggregation: below it, one reducer
    * trivially absorbs any edge's fan-in and the second (tiny) shuffle
    * is pure overhead; above it, a hub edge's witness fan-in is spread
    * over [[DefaultEvidenceSalts]] reducer cells BEFORE the cap
    * applies. The result is bit-identical either way (TopKState's merge
    * is associative+commutative — AggLawsSpec), so the threshold is a
    * cost knob, not a semantics knob. */
  val SaltPageThreshold = 100000L

  /** Edge extraction KEEPING per-edge evidence: same relation rules as
    * [[extract]], but instead of a bare distinct each canonical edge
    * aggregates its witness pages — sorted pipe-joined urls (the
    * reference's pubmeds-style evidence strings,
    * ppi_adapter.py:1268-1303) plus a support count.
    * Output: (subject_id, relation_label, object_id, sources, evidence,
    * n_pages). */
  def extractEvidence(mentions: DataFrame, canon: DataFrame,
                      salts: Int = DefaultEvidenceSalts): DataFrame =
    evidenceFromSets(perPageEntitySets(mentions, canon), canon, salts = salts)

  /** [[extractEvidence]] over precomputed per-page entity sets.
    * `salts` > 1 engages the two-phase salted aggregation
    * (Salted.topKCountSalted): phase 1 groups on (edge, value-salt)
    * cells so a hub edge's witness fan-in lands on `salts` reducers,
    * phase 2 merges the tiny per-cell bounded states. Bit-identical to
    * the single-phase path (merge associativity — AggLawsSpec +
    * TypedGraphSpec hub spec); the flagship pipeline engages it past
    * [[SaltPageThreshold]] pages. */
  def evidenceFromSets(pageSets: DataFrame, canon: DataFrame,
                       evidenceCap: Int = DefaultEvidenceCap,
                       salts: Int = 1): DataFrame = {
    // Same one-scan/one-group shape as extract; the url payload (needed
    // for the witness list) is the only string in the wide shuffles.
    // ONE aggregation: BoundedAggs.topKCount keeps at most `evidenceCap`
    // witnesses per edge in O(cap) reducer state (collect_set buffers
    // the whole group — the plan-level OOM at 10^12 pages) and carries
    // the exact page count alongside. Input rows are one-per-witness-url
    // by construction (pageSets is grouped by url hash and the per-page
    // entity sets are distinct), so `total` IS the distinct page count.
    // Typed aggregates run as ObjectHashAggregate, whose partial phase
    // falls back to sort-based beyond
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold
    // in-memory groups (default 128). That default is the RIGHT trade
    // here and is left alone deliberately: worst-case state is
    // cap(1024) × ~50 B ≈ 50 KB per group, so thousands of hash-resident
    // groups per task could hold hundreds of MB; the sort fallback is
    // spill-safe and its input is the already-hash-keyed pair stream.
    // If the cap is lowered (say 64), raising the threshold becomes the
    // cheap win — revisit the two knobs together, not separately.
    val pairs = relationPairs(pageSets)
    val grouped =
      if (salts > 1)
        graft.functions.Salted.topKCountSalted(pairs,
          Seq("se", "relation_label", "oe"), col("url"), evidenceCap, salts)
          .withColumnRenamed("wit", "ev")
      else {
        val topk = graft.functions.BoundedAggs.topKCount(evidenceCap)
        pairs.groupBy("se", "relation_label", "oe")
          .agg(topk(col("url")).as("ev"))
      }
    val edges = grouped
      .select(col("se"), col("relation_label"), col("oe"),
        concat_ws("|", col("ev.items")).as("evidence"),
        col("ev.total").as("n_pages"))
    val dim = broadcast(canonDim(canon))
    edges
      .join(dim.select(col("ce").as("se"), col("canonical_id").as("subject_id")), "se")
      .join(dim.select(col("ce").as("oe"), col("canonical_id").as("object_id")), "oe")
      .select(col("subject_id"), col("relation_label"), col("object_id"),
        col("evidence"), col("n_pages"))
      .withColumn("sources", lit("web"))
  }

  /** Canonical-pair product co-mention edges from per-page entity sets
    * (the §2.5 reciprocal-dedup pattern in the flagship store path,
    * same semantics as the q_co_ordered oracle): pairs explode
    * map-side from each page's product set, dedup on 8-byte hash
    * pairs, canonical strings restored via the broadcast dimension,
    * pair canonicalized k1 < k2 in string order. */
  def coOrderedFromSets(pageSets: DataFrame, canon: DataFrame): DataFrame = {
    val ps = col("ps")
    // Streaming pair generation over the SORTED set: ascending order
    // makes every emitted pair already (h1 < h2), so the pair SET is
    // identical to the old least/greatest-per-position-pair form (the
    // downstream distinct erases the only difference, emission order)
    // — without materializing the per-page pair array.
    val hp = pageSets.filter(size(ps) >= 2)
      .select(graft.functions.PairExprs.unorderedPairs(array_sort(ps))
        .as(Seq("h1", "h2")))
      .distinct()
    val dim = broadcast(canonDim(canon))
    hp.join(dim.select(col("ce").as("h1"), col("canonical_id").as("c1")), "h1")
      .join(dim.select(col("ce").as("h2"), col("canonical_id").as("c2")), "h2")
      .select(
        least(col("c1"), col("c2")).as("subject_id"),
        lit("co_ordered_with").as("relation_label"),
        greatest(col("c1"), col("c2")).as("object_id"))
  }

  /** Typed node emission (golden schema FIXTURES.md §5 + SURVEY §1.1):
    * `nodes` (id, label, props{name}) enriched with per-label attribute
    * projections — scalar props fused into the `props` map, multi-value
    * props as `props_arr map<string,array<string>>`, and an
    * `embedding array<float>` column (the reference attaches ESM/etc
    * vectors to nodes the same way, uniprot_adapter.py:384-422,
    * schema_config.yaml:32).
    *
    * attrs: (id, props2 map<string,string>, sizes array<string>,
    * embedding array<float>) — a dimension table, broadcast. */
  def nodesTyped(nodes: DataFrame, attrs: DataFrame): DataFrame = {
    val emptyArr = map().cast("map<string,array<string>>")
    nodes.join(broadcast(attrs), Seq("id"), "left")
      .select(
        col("id"), col("label"),
        when(col("props2").isNotNull, map_concat(col("props"), col("props2")))
          .otherwise(col("props")).as("props"),
        when(col("sizes").isNotNull, map(lit("sizes"), col("sizes")))
          .otherwise(emptyArr).as("props_arr"),
        col("embedding"))
  }
}
