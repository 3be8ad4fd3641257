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

  def extract(mentions: DataFrame, canon: DataFrame): DataFrame = {
    val cust = mentions.filter(col("entity_label") === "customer")
      .select(col("url"), col("entity_id").as("subject_id"))
      .distinct()
    val prod = mentions.filter(col("entity_label") === "product")
      .select(col("url"), col("entity_id").as("object_id"))
      .distinct()
    val nat = mentions.filter(col("entity_label") === "nation")
      .select(col("url"), col("entity_id").as("object_id"))
      .distinct()

    val ordered = cust.join(prod, "url")
      .select(col("subject_id"), lit("ordered").as("relation_label"), col("object_id"))
    val located = cust.join(nat, "url")
      .select(col("subject_id"), lit("located_in").as("relation_label"), col("object_id"))

    val raw = ordered.unionByName(located)
    val canonSubj = Canonicalize.canonicalize(raw, "subject_id", canon)
    val canonBoth = Canonicalize.canonicalize(canonSubj, "object_id", canon)
    canonBoth
      .select(col("subject_id"), col("relation_label"), col("object_id"))
      .distinct()
  }

  /** Node emission: distinct canonical entities with label + name prop
    * (reference node tuple (id, label, props) — SURVEY.md §2.10). */
  def nodes(mentions: DataFrame, canon: DataFrame): DataFrame = {
    val ents = mentions
      .select(col("entity_id"), col("entity_label").as("label"), col("alias").as("name"))
      .distinct()
    Canonicalize.canonicalize(ents, "entity_id", canon)
      .groupBy(col("entity_id").as("id"), col("label"))
      .agg(min("name").as("name"))
      .select(col("id"), col("label"), map(lit("name"), col("name")).as("props"))
  }

  /** Edge extraction KEEPING per-edge evidence: same relation rules as
    * [[extract]], but instead of a bare distinct each canonical edge
    * aggregates its witness pages — sorted pipe-joined urls (the
    * reference's pubmeds-style evidence strings,
    * ppi_adapter.py:1268-1303) plus a support count.
    * Output: (subject_id, relation_label, object_id, sources, evidence,
    * n_pages). */
  def extractEvidence(mentions: DataFrame, canon: DataFrame): DataFrame = {
    val cust = mentions.filter(col("entity_label") === "customer")
      .select(col("url"), col("entity_id").as("subject_id")).distinct()
    val prod = mentions.filter(col("entity_label") === "product")
      .select(col("url"), col("entity_id").as("object_id")).distinct()
    val nat = mentions.filter(col("entity_label") === "nation")
      .select(col("url"), col("entity_id").as("object_id")).distinct()

    val ordered = cust.join(prod, "url")
      .select(col("url"), col("subject_id"),
        lit("ordered").as("relation_label"), col("object_id"))
    val located = cust.join(nat, "url")
      .select(col("url"), col("subject_id"),
        lit("located_in").as("relation_label"), col("object_id"))

    val raw = ordered.unionByName(located)
    val canonSubj = Canonicalize.canonicalize(raw, "subject_id", canon)
    val canonBoth = Canonicalize.canonicalize(canonSubj, "object_id", canon)
    canonBoth
      .groupBy("subject_id", "relation_label", "object_id")
      .agg(
        concat_ws("|", array_sort(collect_set(col("url")))).as("evidence"),
        countDistinct(col("url")).as("n_pages"))
      .withColumn("sources", lit("web"))
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
