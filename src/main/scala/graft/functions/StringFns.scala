package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string/numeric functions mirroring the reference's coercion
  * vocabulary (SURVEY.md §2.8), as pure Column expressions — codegen'd,
  * no UDFs.
  */
object StringFns {

  /** F3: protein-name-style parser (uniprot_adapter.py:885-961).
    * "Acetate kinase (EC 2.7.2.1) (Acetokinase)" -> ["Acetate kinase",
    * "Acetokinase"]: truncate at " [Cleaved" / " [Includes", split on
    * " (", trim trailing ")", drop "EC …" and "Fragment…" segments. */
  def parseProteinNames(c: Column): Column = {
    val truncated = regexp_replace(c, "\\s*\\[(Cleaved|Includes).*$", "")
    val parts = split(truncated, "\\s+\\(")
    val trimmed = transform(parts, p => regexp_replace(p, "\\)+\\s*$", ""))
    filter(trimmed, p =>
      !(p.startsWith("EC ") || p.startsWith("Fragment") || p === "" ))
  }

  /** F5: comma-grouped int parse "12,345" -> 12345L
    * (uniprot_adapter.py:450-458). */
  def commaInt(c: Column): Column =
    regexp_replace(c, ",", "").cast("long")

  /** F5: float-string to int-string truncation "800.0" -> "800"
    * (ppi_adapter.py:830-839). */
  def floatToIntString(c: Column): Column =
    regexp_replace(c, "\\.[0-9]*$", "")

  /** F2: KEGG-style "hsa:1017" -> "1017" (uniprot_adapter.py:871-873). */
  def keggLocal(c: Column): Column = element_at(split(c, ":"), -1)

  /** F2: take-first of ';'-separated list (entrez take-first,
    * uniprot_adapter.py:875-877). */
  def takeFirst(c: Column, sep: String = ";"): Column =
    element_at(split(c, sep), 1)

  /** F10: EC-code parent derivation (ec_adapter.py:383-446):
    * "1.2.3.4" -> ["1.2.3.-", "1.2.-.-", "1.-.-.-"]. */
  def ecParents(c: Column): Column = {
    val p = split(c, "\\.")
    array(
      concat_ws(".", element_at(p, 1), element_at(p, 2), element_at(p, 3), lit("-")),
      concat_ws(".", element_at(p, 1), element_at(p, 2), lit("-"), lit("-")),
      concat_ws(".", element_at(p, 1), lit("-"), lit("-"), lit("-")))
  }

  /** Direct parent only (one hierarchy level up). */
  def ecParent(c: Column): Column = {
    val p = split(c, "\\.")
    val lv = size(filter(p, x => x =!= "-")) // specificity level 1..4
    when(lv === 4, concat_ws(".", element_at(p, 1), element_at(p, 2), element_at(p, 3), lit("-")))
      .when(lv === 3, concat_ws(".", element_at(p, 1), element_at(p, 2), lit("-"), lit("-")))
      .when(lv === 2, concat_ws(".", element_at(p, 1), lit("-"), lit("-"), lit("-")))
      .otherwise(lit(null))
  }

  /** F1: CURIE prefixing (add_prefix_to_id, uniprot_adapter.py:1010-1021):
    * normalize = lowercase prefix + strip a redundant duplicated prefix
    * ("GO:GO:123" -> "go:123" style banana). */
  def curie(prefix: String, id: Column): Column = {
    val stripped = regexp_replace(id, "^(?i)" + java.util.regex.Pattern.quote(prefix) + ":", "")
    concat(lit(prefix.toLowerCase(java.util.Locale.ROOT)), lit(":"), stripped)
  }

  /** P6: pattern-based null-out (pubmed ids containing "unassigned" →
    * null, ppi_adapter.py:307-313). */
  def nullOutIfContains(c: Column, needle: String): Column =
    when(c.contains(needle), lit(null)).otherwise(c)

  /** F4: Neo4j-CSV sanitization ('|' -> ',', "'" -> '^', trim) — only at
    * the CSV sink; parquet keeps raw (uniprot_adapter.py:460-468). */
  def sanitize(c: Column): Column =
    trim(translate(c, "|'", ",^"))
}
