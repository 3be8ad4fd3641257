package graft.model

import java.sql.Timestamp

/** Core data model of the KG-construction engine.
  *
  * Mirrors the reference's fundamental abstractions (SURVEY.md §1.1):
  *   - node tuple (id, label, props)        — e.g. uniprot_adapter.py:537-594
  *   - edge tuple (source, target, label, props) — e.g. ppi_adapter.py:650-690
  * re-expressed as Spark `Dataset[T]` row types, plus the web-page input
  * shape mandated by BASELINE.json's input_hint.
  */

/** Input row: Common-Crawl-style page (BASELINE.json input_hint).
  * `text` is the reference extraction output; the engine's extractor must
  * reproduce it byte-identically from `html` (per-url invariant).
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** A detected entity mention in a page's extracted text. */
final case class Mention(
    url: String,
    pos: Int,          // token position of the mention start
    alias: String,     // surface form matched against the dictionary
    entity_id: String, // raw (pre-canonicalization) entity id
    entity_label: String
)

/** KG node (reference node tuple: (id, label, props)). */
final case class Node(
    id: String,
    label: String,
    props: Map[String, String]
)

/** KG edge / triple (reference edge tuple: (_, source, target, label, props)). */
final case class Edge(
    subject_id: String,
    relation_label: String,
    object_id: String,
    properties: Map[String, String]
)

/** Per-partition lineage row written with every committed snapshot
  * (north rule: resumable with per-partition lineage + metrics). */
final case class LineageRow(
    stage: String,
    snapshot: Long,
    partition_id: Int,
    input_hash: Long,
    row_counts: Long,
    stage_ms: Long
)
