package graft.text

import scala.collection.mutable

/** Aho–Corasick multi-pattern automaton (Aho & Corasick, CACM 1975):
  * counts ALL occurrences (including overlaps, including patterns nested
  * inside other patterns) of every pattern in one left-to-right pass over
  * the text — the scan cost is O(|text| + matches) no matter how many
  * patterns the dictionary holds, versus K independent `instr` passes.
  *
  * Built once on the driver and BROADCAST: at 100 TB the text moves zero
  * times extra — each executor holds the automaton (goto table is dense
  * over 7-bit chars; dictionary suffix outputs are pre-merged per node so
  * the scan never walks fail chains) and the per-doc result is a fixed
  * K-long count vector, map-only until the final tiny per-keyword fold.
  *
  * Reference behavior anchor: the keyword-tagging pass a curation
  * pipeline runs for topic/PII/blocklist hits (cf. the reference's
  * form-type tag filters, sec_dl/utils/scrape_all_filings.py — its
  * tagging is per-filing string matching; this is the one-pass
  * dictionary-scale version).
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  private val ALPHA = 128 // 7-bit alphabet; chars >= 128 reset to root

  // Dense goto table built trie-first, then BFS-converted to a full DFA
  // (goto[node][c] always defined), with per-node pre-merged output lists.
  private val (gotoTab: Array[Array[Int]], outTab: Array[Array[Int]]) = {
    val gt = mutable.ArrayBuffer(Array.fill(ALPHA)(-1))
    val ends = mutable.ArrayBuffer(List.empty[Int])
    // trie insert
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { ch =>
        val c = ch.toInt
        require(c < ALPHA, s"pattern char out of 7-bit range: '$ch'")
        if (gt(node)(c) == -1) {
          gt(node)(c) = gt.size
          gt += Array.fill(ALPHA)(-1)
          ends += Nil
        }
        node = gt(node)(c)
      }
      ends(node) = pi :: ends(node)
    }
    // BFS: fail links folded directly into the goto table (full DFA) and
    // output lists merged through the fail chain.
    val fail = Array.fill(gt.size)(0)
    val queue = mutable.Queue.empty[Int]
    var c = 0
    while (c < ALPHA) {
      val nxt = gt(0)(c)
      if (nxt == -1) gt(0)(c) = 0
      else { fail(nxt) = 0; queue.enqueue(nxt) }
      c += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      ends(u) = ends(u) ++ ends(fail(u))
      var c = 0
      while (c < ALPHA) {
        val v = gt(u)(c)
        if (v == -1) gt(u)(c) = gt(fail(u))(c)
        else { fail(v) = gt(fail(u))(c); queue.enqueue(v) }
        c += 1
      }
    }
    (gt.toArray, ends.map(_.toArray).toArray)
  }

  /** Count vector aligned with `patterns`: c(i) = number of occurrences
    * (all positions, overlaps included) of patterns(i) in `text`. */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var node = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i).toInt
      node = if (c < ALPHA) gotoTab(node)(c) else 0
      val out = outTab(node)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }
}

object AhoCorasick {
  /** A pattern has a proper border iff some proper prefix equals a proper
    * suffix — exactly the condition under which occurrences can overlap
    * themselves. Borderless patterns make all-occurrence counting equal
    * greedy non-overlapping counting (which is what a
    * length-delta/replace oracle computes), so catalog queries that want
    * a SQL oracle assert borderlessness first. */
  def hasProperBorder(p: String): Boolean =
    (1 until p.length).exists(k => p.substring(0, k) == p.substring(p.length - k))
}
