package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mention detection + dictionary/alias entity linking (north-rule
  * stage 2). Two matchers share one contract:
  *
  *  - [[mentionsTrie]] — the product path: a broadcast token trie
  *    scanned in mapPartitions, arbitrary alias token length, no row
  *    explosion (the reference's alias universe is arbitrary-length:
  *    protein names uniprot_adapter.py:885-961, drug names
  *    drug_adapter.py:2066-2096).
  *  - [[mentionsJoin]] — the declarative uni+bigram variant (codegen'd
  *    explode + broadcast hash join), kept as the Catalyst-only
  *    cross-check; equivalence on ≤2-token dictionaries is spec-tested.
  *
  * Ambiguous aliases are either dropped at dictionary resolution
  * ([[resolveDict]], the reference's multi-mapping drop) or broken by
  * TF-IDF cosine re-ranking against entity context profiles
  * ([[rerank]]) instead of being thrown away.
  *
  * At 100 TB the pages table is the only big side; the dictionary is a
  * dimension and never shuffles the fact table.
  */
object Linker {

  /** Deterministic tokenizer: strip sentence punctuation, split on runs
    * of spaces. Locale-free (no case folding — the dictionary stores
    * surface forms). */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(text, "[.,:;]", "")), " +")

  /** Plain-Scala mirror of [[tokens]] for the mapPartitions hot loop:
    * one pass, no regex, no intermediate strings beyond the tokens
    * themselves. Equality with the Column form is spec-asserted on the
    * full corpus (byte-identical token arrays). */
  def tokenize(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == ',' || c == ':' || c == ';') ()
      else if (c == ' ') {
        if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      } else sb.append(c)
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    // split(trim(""), " +") yields [""] — mirror that exactly.
    if (out.isEmpty) Array("") else out.toArray
  }

  /** Resolve the alias dictionary to one entity per alias:
    * minimum priority wins; an alias with >1 distinct entity at its
    * minimum priority is AMBIGUOUS and dropped entirely (the reference's
    * multi-mapping drop, ppi_adapter.py:520-529 / SURVEY.md P5). */
  def resolveDict(dict: DataFrame): DataFrame = {
    val minp = dict.groupBy(col("alias").as("a")).agg(min("priority").as("p"))
    dict
      .join(minp, dict("alias") === minp("a") && dict("priority") === minp("p"))
      .groupBy("alias")
      .agg(
        countDistinct("entity_id").as("n"),
        min("entity_id").as("entity_id"),
        min("entity_label").as("entity_label"))
      .filter(col("n") === 1)
      .select(col("alias"), col("entity_id"), col("entity_label"))
  }

  /** Broadcast-trie mention matcher: every occurrence of every
    * dictionary alias (any token length, overlaps included) in `text`.
    * Input: (url, text); dict: (alias, entity_id, entity_label) —
    * multiple rows per alias allowed (candidates for [[rerank]]).
    * Output: (url, pos, alias, entity_id, entity_label).
    *
    * Only the FLAT dictionary rows are collected and broadcast — the
    * dimension-table payload a broadcast join would ship anyway. The
    * pointer-heavy trie (transition table + interning map, a multiple
    * of the raw row bytes) is built ONCE PER EXECUTOR JVM, lazily, via
    * [[TokenTrie.fromBroadcast]] — never on the driver, so the driver
    * ceiling is the row bytes, not the index (VERDICT r5 Wrong #3).
    * The fact (pages) side streams through mapPartitions with zero
    * shuffle and zero row explosion. */
  def mentionsTrie(pagesText: DataFrame, dict: DataFrame): DataFrame = {
    val spark = pagesText.sparkSession
    import spark.implicits._
    val entries = dict.select("alias", "entity_id", "entity_label")
      .distinct()
      .as[(String, String, String)].collect()
    trieMatch(pagesText, entries)
  }

  /** The shared trie-match core over already-collected dictionary
    * entries. Entries are sorted before broadcast so the broadcast
    * payload (and the trie's per-alias candidate order) is independent
    * of the collect's partition order. */
  private def trieMatch(pagesText: DataFrame,
                        entriesRaw: Array[(String, String, String)]): DataFrame = {
    val spark = pagesText.sparkSession
    import spark.implicits._
    val entries = entriesRaw.sorted(Ordering.Tuple3(
      graft.functions.BoundedAggs.utf8Ordering,
      graft.functions.BoundedAggs.utf8Ordering,
      graft.functions.BoundedAggs.utf8Ordering))
    val bc = spark.sparkContext.broadcast(entries)
    pagesText.select(col("url"), col("text")).as[(String, String)]
      .mapPartitions { rows =>
        val t = TokenTrie.fromBroadcast(bc)
        rows.flatMap { case (url, text) => t.matchTokens(url, tokenize(text)) }
      }
      .toDF()
  }

  /** Detect dictionary mentions in `text` with priority-resolved,
    * ambiguity-dropped aliases (the default stage-2 path).
    *
    * The dictionary is a DIMENSION (it is collected and broadcast for
    * the trie either way), so the rank-1 resolution runs driver-side
    * over the collected rows instead of as a 3-exchange Spark plan
    * whose only consumer is a collect — that plan was ~4 serial tiny
    * stages of fixed latency on the critical path of every flagship
    * query. Semantics mirror [[resolveDict]] exactly (min priority,
    * ambiguity drop, UTF-8-binary min — Spark's own string `min`
    * collation — for the surviving id/label); equivalence is
    * spec-asserted against the relational form. */
  def mentions(pagesText: DataFrame, dict: DataFrame): DataFrame = {
    val spark = pagesText.sparkSession
    import spark.implicits._
    val raw = dict
      .select(col("alias"), col("entity_id"), col("entity_label"),
        col("priority").cast("int"))
      .as[(String, String, String, Int)].collect()
    trieMatch(pagesText, resolveDictLocal(raw))
  }

  /** Driver-side mirror of [[resolveDict]] over collected dictionary
    * rows: minimum priority wins; an alias with more than one distinct
    * entity at its minimum priority is dropped; the surviving id and
    * label are the UTF-8-binary minima over the min-priority rows. */
  private[graft] def resolveDictLocal(
      rows: Array[(String, String, String, Int)]): Array[(String, String, String)] = {
    val ord = graft.functions.BoundedAggs.utf8Ordering
    val byAlias = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[(String, String, Int)]]()
    rows.foreach { case (a, id, lbl, p) =>
      byAlias.computeIfAbsent(a, _ => scala.collection.mutable.ArrayBuffer.empty)
        .append((id, lbl, p))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    byAlias.forEach { (alias, es) =>
      val minp = es.iterator.map(_._3).min
      val atMin = es.filter(_._3 == minp)
      val ids = atMin.map(_._1).distinct
      if (ids.size == 1)
        out += ((alias, ids.min(ord), atMin.map(_._2).min(ord)))
    }
    out.toArray
  }

  /** Declarative uni+bigram matcher: candidate n-grams via codegen'd
    * array expressions, linking via broadcast hash join. Limited to
    * ≤2-token aliases by construction — kept as the Catalyst-only
    * cross-check for [[mentionsTrie]] (SURVEY.md J5). */
  def mentionsJoin(pagesText: DataFrame, dict: DataFrame): DataFrame = {
    val d = broadcast(resolveDict(dict))
    val toks = pagesText
      .select(col("url"), tokens(col("text")).as("toks"))

    val uni = toks.select(
      col("url"), posexplode(col("toks")).as(Seq("pos", "cand")))

    val bi = toks
      .filter(size(col("toks")) >= 2)
      .select(
        col("url"),
        posexplode(
          zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat_ws(" ", a, b))).as(Seq("pos", "cand")))

    uni.unionByName(bi)
      .join(d, col("cand") === d("alias"))
      .select(
        col("url"), col("pos"), col("alias"),
        col("entity_id"), col("entity_label"))
  }

  /** TF-IDF cosine re-rank: break ambiguous aliases by scoring each
    * candidate entity's context profile against the page's content
    * instead of dropping the mention (north-rule stage 2 "TF-IDF cosine
    * re-rank").
    *
    * cands:     (url, alias, entity_id) — >1 entity_id per (url, alias)
    * pagesText: (url, text) — the idf corpus AND the per-page context
    * profiles:  (entity_id, ptext) — entity context documents
    *
    * Cross-engine determinism: tf and df are exact integers; the idf
    * weight is integer division w = scale div (df+1) (rare terms weigh
    * more; no transcendentals, so the DuckDB oracle reproduces it
    * bit-for-bit); norms and dot products are exact integer sums
    * (< 2^53), and the ONLY floating-point ops are one multiply, one
    * sqrt and one division at the very end — identical IEEE results in
    * any engine, independent of partitioning and summation order.
    *
    * Scale: the token vocabulary (df/w) and the profile side are
    * dimensions (broadcast); the page-token aggregations are one
    * shuffle each over the exploded fact side; candidate scoring
    * shuffles only candidate rows. */
  def rerank(cands: DataFrame, pagesText: DataFrame, profiles: DataFrame,
             scale: Long = 1000000L): DataFrame = {
    val toks = pagesText.select(col("url"), explode(tokens(col("text"))).as("tok"))
    val dfTok = toks.distinct().groupBy("tok").agg(count(lit(1)).as("df"))
    val w = broadcast(dfTok.select(col("tok"), expr(s"$scale div (df + 1)").as("w")))

    // Page side: tf and weighted norm per url (every page token has df>=1).
    val tfw = toks.groupBy("url", "tok").agg(count(lit(1)).as("tfp"))
      .join(w, "tok")
    val pageNorm = tfw.groupBy("url")
      .agg(sum(col("tfp") * col("tfp") * col("w") * col("w")).as("np"))

    // Profile side (dimension): profile-only tokens get df=0 weight.
    val ptw = profiles
      .select(col("entity_id"), explode(tokens(col("ptext"))).as("tok"))
      .groupBy("entity_id", "tok").agg(count(lit(1)).as("tfe"))
      .join(w, Seq("tok"), "left")
      .select(col("entity_id"), col("tok"), col("tfe"),
        coalesce(col("w"), lit(scale)).as("we"))
    val profNorm = ptw.groupBy("entity_id")
      .agg(sum(col("tfe") * col("tfe") * col("we") * col("we")).as("ne"))

    // Dot product over common tokens; w == we on join hits by
    // construction (both are the corpus weight of the same token).
    val num = cands
      .join(ptw, "entity_id")
      .join(tfw.select(col("url"), col("tok"), col("tfp")), Seq("url", "tok"))
      .groupBy("url", "alias", "entity_id")
      .agg(sum(col("tfp") * col("tfe") * col("we") * col("we")).as("num"))

    val scored = cands
      .join(num, Seq("url", "alias", "entity_id"), "left")
      .join(pageNorm, "url")
      .join(broadcast(profNorm), "entity_id")
      .withColumn("cos",
        coalesce(col("num"), lit(0L)).cast("double") /
          sqrt(col("np").cast("double") * col("ne").cast("double")))
    val win = Window.partitionBy("url", "alias")
      .orderBy(col("cos").desc, col("entity_id").asc)
    scored.withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select("url", "alias", "entity_id")
  }
}
