package graft.link

import scala.collection.mutable

/** One dictionary row carried to executors inside the trie. */
final case class DictEntry(alias: String, entityId: String, entityLabel: String)

/** An emitted mention occurrence (column names are the DataFrame schema). */
final case class Mention(url: String, pos: Int, alias: String,
                         entity_id: String, entity_label: String)

/** Token-level trie for multi-token dictionary matching (north-rule
  * stage 2: "dictionary/alias entity linking scored via broadcast trie").
  *
  * The reference probes per-record Python dicts with arbitrary-length
  * alias keys (uniprot_adapter.py:885-961 protein names,
  * drug_adapter.py:2066-2096 drug names); the distributed analogue is
  * this immutable trie built once on the driver from the (small)
  * dictionary dimension, broadcast to every executor, and scanned over
  * each page's token stream in mapPartitions — O(tokens × maxAliasLen)
  * per page, no row explosion, no join, no shuffle of the fact table.
  *
  * Representation is dictionary-encoded for the hot loop: tokens are
  * interned to dense ints (string hash once per page token, integer
  * transitions after), transitions live in one primitive-keyed map
  * (state<<32|tokenId), and terminal states carry their payload lists.
  * Matching emits EVERY dictionary alias at every position (overlaps
  * included) — same semantics as the unigram+bigram join matcher, which
  * this generalizes to arbitrary token length.
  */
final class TokenTrie private (
    vocab: java.util.HashMap[String, Integer],
    trans: java.util.HashMap[java.lang.Long, Integer],
    terminals: Array[List[DictEntry]]) extends Serializable {

  def nStates: Int = terminals.length

  /** All dictionary matches in `toks`; one Mention per (position, alias,
    * payload) occurrence. */
  def matchTokens(url: String, toks: Array[String]): Iterator[Mention] = {
    val out = mutable.ArrayBuffer.empty[Mention]
    val n = toks.length
    // Intern the page tokens once: -1 = not in any alias.
    val ids = new Array[Int](n)
    var t = 0
    while (t < n) {
      val v = vocab.get(toks(t))
      ids(t) = if (v == null) -1 else v.intValue
      t += 1
    }
    var i = 0
    while (i < n) {
      var state = 0
      var j = i
      var live = ids(j) >= 0
      while (live) {
        val next = trans.get(java.lang.Long.valueOf((state.toLong << 32) | ids(j)))
        if (next == null) live = false
        else {
          state = next.intValue
          val ts = terminals(state)
          if (ts != null) ts.foreach { e =>
            out += Mention(url, i, e.alias, e.entityId, e.entityLabel)
          }
          j += 1
          live = j < n && ids(j) >= 0
        }
      }
      i += 1
    }
    out.iterator
  }
}

object TokenTrie {

  /** Build from (aliasTokens, payload) pairs. Multiple payloads per
    * alias are kept (ambiguous dictionaries emit one row per candidate;
    * resolution/re-ranking is the caller's concern). */
  def build(entries: IterableOnce[(Array[String], DictEntry)]): TokenTrie = {
    val vocab = new java.util.HashMap[String, Integer]
    val trans = new java.util.HashMap[java.lang.Long, Integer]
    val term = mutable.HashMap.empty[Int, List[DictEntry]]
    var nStates = 1 // state 0 = root
    entries.iterator.foreach { case (toks, e) =>
      if (toks.nonEmpty && toks.head.nonEmpty) {
        var state = 0
        toks.foreach { tok =>
          val tid = vocab.computeIfAbsent(tok, _ => Integer.valueOf(vocab.size))
          val key = java.lang.Long.valueOf((state.toLong << 32) | tid.longValue)
          val nx = trans.get(key)
          if (nx == null) {
            trans.put(key, Integer.valueOf(nStates))
            state = nStates
            nStates += 1
          } else state = nx.intValue
        }
        term(state) = e :: term.getOrElse(state, Nil)
      }
    }
    val arr = new Array[List[DictEntry]](nStates)
    term.foreach { case (s, l) => arr(s) = l.reverse }
    new TokenTrie(vocab, trans, arr)
  }
}
