package graft.search

import scala.collection.mutable.ArrayBuffer

/** Levenshtein-automaton walk over a sorted term dictionary.
  *
  * The reference intersects a Levenshtein DFA with its words FST to
  * enumerate typo derivations (reference
  * crates/milli/src/search/new/query_term/compute_derivations.rs:80-165,
  * build_dfa at milli/src/search/mod.rs:374-386). Here the sorted term
  * array is walked as an implicit trie: a node is the contiguous range
  * of terms sharing a prefix; its children are the distinct next
  * characters (found by binary search). Each node carries one banded-DP
  * row of the edit-distance matrix; a subtree is pruned as soon as the
  * row minimum exceeds the budget. Visited nodes ≈ O(matches × alphabet
  * at the frontier), independent of vocabulary size — the property the
  * spec asserts — vs the previous per-query scan of every term.
  */
object LevWalk extends Serializable {

  /** Number of trie nodes visited by the last call on this thread
    * (observability for the sub-linearity spec). */
  private val lastVisited = new ThreadLocal[Int] { override def initialValue = 0 }
  def visitedNodes: Int = lastVisited.get()

  /** All (term, distance) in `sorted` with edit distance ≤ maxDist from
    * `w`. `sorted` MUST be sorted ascending (String natural order).
    * Includes the exact term (distance 0) when present. */
  def apply(sorted: Array[String], w: String, maxDist: Int): Seq[(String, Int)] = {
    val out = new ArrayBuffer[(String, Int)]
    if (sorted.isEmpty) { lastVisited.set(0); return out.toSeq }
    val wl = w.length
    var visited = 0

    // first index in [lo, hi) whose char at `depth` is > c (all terms in
    // the range share the first `depth` chars and are ≥ depth+1 long
    // except possibly sorted(lo) == prefix, which the caller skips)
    def upperBound(lo: Int, hi: Int, depth: Int, c: Char): Int = {
      var a = lo; var b = hi
      while (a < b) {
        val m = (a + b) >>> 1
        if (sorted(m).charAt(depth) <= c) a = m + 1 else b = m
      }
      a
    }

    def go(lo0: Int, hi: Int, depth: Int, row: Array[Int]): Unit = {
      visited += 1
      var lo = lo0
      if (sorted(lo).length == depth) { // the prefix itself is a term
        if (row(wl) <= maxDist) out += ((sorted(lo), row(wl)))
        lo += 1
      }
      while (lo < hi) {
        val c = sorted(lo).charAt(depth)
        val childHi = upperBound(lo, hi, depth, c)
        // extend the DP row by character c (banded: values > maxDist+1
        // are clamped so the min-prune test stays exact)
        val nr = new Array[Int](wl + 1)
        nr(0) = row(0) + 1
        var mn = nr(0)
        var j = 1
        while (j <= wl) {
          val sub = row(j - 1) + (if (w.charAt(j - 1) == c) 0 else 1)
          val del = row(j) + 1
          val ins = nr(j - 1) + 1
          val v = math.min(sub, math.min(del, ins))
          nr(j) = v
          if (v < mn) mn = v
          j += 1
        }
        if (mn <= maxDist) go(lo, childHi, depth + 1, nr)
        lo = childHi
      }
    }

    go(0, sorted.length, 0, Array.tabulate(wl + 1)(identity))
    lastVisited.set(visited)
    out.toSeq
  }
}
