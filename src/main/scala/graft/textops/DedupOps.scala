package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication family for training-data pipelines:
  * exact, n-gram Jaccard (inverted-index exact), MinHash+LSH
  * (candidate generation + exact verification), SimHash (hamming
  * near-dup), embedding-cosine near-dup.
  *
  * Scale design notes:
  *  - exact dedup: one shuffle on xxhash64(text) — group on the hash,
  *    not the full text, so shuffle keys are 8 bytes;
  *  - jaccard: inverted index (explode shingles → self-join on shingle)
  *    instead of all-pairs; hot shingles are capped by document
  *    frequency to bound the quadratic blowup exactly the way public
  *    near-dup pipelines do;
  *  - minhash: signatures are one narrow shuffle per doc; banding makes
  *    candidate generation an equi-join; exact-verify keeps precision 1.
  */
object DedupOps {

  /** Exact dedup: canonical (min) doc id + cluster size per distinct text. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(xxhash64(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Distinct word-n-gram shingles per doc. The token array is
    * let-bound so it is computed once per row, not once per n-gram
    * (TextOps.let — CollapseProject guard). */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextOps.let(TextOps.tokens(col(textCol)),
          toks => array_distinct(TextOps.shingles(toks, n))).as("shs"))
      .filter(size(col("shs")) > 0)

  /** Exact n-gram Jaccard pairs with similarity >= tau, via inverted
    * index. `maxDf` drops shingles present in more than maxDf docs
    * (stopword-gram guard at scale): a posting of d docs emits d·(d-1)/2
    * pairs, so the default 500 caps any one shingle at ~125k pairs —
    * a cap of 10^6 would let one hot shingle emit 5·10^11 pairs.
    * Dropped hot shingles are counted and logged (never silent).
    * Output: (id1, id2, common, size1, size2) — integers only; id1 < id2.
    *
    * Correctness note: dropping a shingle with df > maxDf only loses
    * pairs whose ONLY evidence is near-stopword grams; tau-similar pairs
    * share many shingles and survive (property-tested on the fixture). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, tau: Double, maxDf: Long = 500L): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, n)
    val sizes = sets.select(col("doc_id"), size(col("shs")).as("sz"))
    val inv = sets.select(col("doc_id"), explode(col("shs")).as("sh"))
    // One shuffle builds the posting list per shingle; pairs are then
    // emitted map-side from each posting (no self-join, no window sort).
    // The df cap bounds the per-posting quadratic blowup (hot-shingle
    // guard at scale — the cap drops only pathological stopword-grams).
    // Persisted so the drop-count action and the pair emission share one
    // inverted-index shuffle instead of recomputing it.
    val allPostings = inv.groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDropped = allPostings.filter(size(col("ds")) > maxDf).count()
    if (nDropped > 0)
      println(s"[ngramJaccardPairs] dropped $nDropped hot shingles with df > $maxDf")
    val postings = allPostings.filter(size(col("ds")) <= maxDf)
    val pairExpr = flatten(transform(
      sequence(lit(0), size(col("ds")) - 2),
      i => transform(
        slice(col("ds"), i + 2, size(col("ds")) - i - 1),
        d2 => struct(element_at(col("ds"), i + 1).as("id1"), d2.as("id2")))))
    val pairs = postings
      .select(explode(pairExpr).as("p"))
      .groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.select(col("doc_id").as("id1"), col("sz").as("size1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("sz").as("size2")), "id2")
      .filter(col("common") * (1.0 + tau) >= lit(tau) * (col("size1") + col("size2")))
      .select("id1", "id2", "common", "size1", "size2")
  }

  /** MinHash signature matrix: (doc_id, i, minhash) for i in 0..k-1.
    * h_i(x) = (a_i * (xxhash64(shingle) mod p) + b_i) mod p with fixed
    * deterministic coefficients — products stay < 2^62 (ANSI-safe). */
  private val P = 2147483647L // 2^31 - 1
  private def hashParams(k: Int): Seq[(Int, Long, Long)] =
    (0 until k).map(i => (i, 1103515245L * (i + 1) % P, 12345L + 2654435761L * i % P))

  /** Shuffle-FREE signature computation: the whole k-permutation min is
    * a per-row array expression (shingle hashes once, then k mins over
    * the hash array) — minhashing is embarrassingly parallel and must
    * not shuffle at 100 TB. Output: (doc_id, sig array<long>[k]). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int): DataFrame = {
    val params = hashParams(k)
    shingleSets(docs, idCol, textCol, n)
      .select(col("doc_id"),
        TextOps.let(transform(col("shs"), sh => pmod(xxhash64(sh), lit(P))),
          xs => array(params.map { case (_, a, b) =>
            array_min(transform(xs, x => pmod(lit(a) * x + lit(b), lit(P))))
          }: _*)).as("sig"))
  }

  /** LSH candidate pairs from banded signatures (bands of r rows), then
    * EXACT Jaccard verification >= tau (precision 1; recall governed by
    * the (k, r) banding curve). */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          n: Int = 3, k: Int = 64, r: Int = 2,
                          tau: Double = 0.5): DataFrame = {
    val sig = minhashSignatures(docs, idCol, textCol, n, k)
    val nBands = k / r
    val buckets = sig.select(col("doc_id"),
        posexplode(array((0 until nBands).map { b =>
          xxhash64(concat_ws(",",
            (0 until r).map(j => element_at(col("sig"), b * r + j + 1)): _*))
        }: _*)).as(Seq("band", "bucket")))
    val cand = buckets.alias("a").join(buckets.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    // exact verify on candidates only
    val sets = shingleSets(docs, idCol, textCol, n)
    val verified = cand
      .join(sets.select(col("doc_id").as("id1"), col("shs").as("shs1")), "id1")
      .join(sets.select(col("doc_id").as("id2"), col("shs").as("shs2")), "id2")
      .withColumn("common", size(array_intersect(col("shs1"), col("shs2"))))
      .withColumn("size1", size(col("shs1")))
      .withColumn("size2", size(col("shs2")))
      .filter(col("common") * (1.0 + tau) >= lit(tau) * (col("size1") + col("size2")))
    verified.select("id1", "id2", "common", "size1", "size2")
  }

  /** 64-bit SimHash per doc over token hashes (FNV-1a based, computed in
    * pure column expressions bit-by-bit would explode the plan; instead
    * a compact 16-bit variant per band keeps it relational). Here:
    * classic 64-bit simhash via typed map (plain Scala, distributed). */
  def simhash64(tokens: Seq[String]): Long = {
    val counts = new Array[Int](64)
    tokens.foreach { t =>
      var h = 0xcbf29ce484222325L // FNV offset basis
      var i = 0
      while (i < t.length) { h ^= t.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1; b += 1 }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming.
    * Banding on 4×16-bit chunks: a pair within hamming 3 must agree on
    * at least one chunk (pigeonhole), so candidates are an equi-join. */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, simhash64(text.trim.split("\\s+").toSeq)) }
      .toDF("doc_id", "sig")
    val chunks = sigs.select(col("doc_id"), col("sig"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("chunk"),
            shiftright(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL)).as("val"))): _*)).as("c"))
      .select(col("doc_id"), col("sig"), col("c.chunk"), col("c.val"))
    chunks.alias("a").join(chunks.alias("b"),
        col("a.chunk") === col("b.chunk") && col("a.val") === col("b.val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.sig").as("sig1"), col("b.sig").as("sig2"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig1").bitwiseXOR(col("sig2"))))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }
}
