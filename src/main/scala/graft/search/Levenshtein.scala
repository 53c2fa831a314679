package graft.search

/** Standard Levenshtein edit distance (insert/delete/substitute, unit
  * costs) — the metric behind the reference's typo tolerance
  * (reference build_dfa, milli/src/search/mod.rs:374-386; budgets in
  * query_term/parse_query.rs:194-215). Two-row DP, O(|a|·|b|).
  */
object Levenshtein extends Serializable {
  def apply(a: String, b: String): Int = {
    if (a == b) return 0
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  /** The reference's per-word typo budget: 0 if len<5, 1 if len<9,
    * else 2 (parse_query.rs:194-215 with default one_typo=5, two_typo=9
    * thresholds, index.rs:36-37). */
  def budgetFor(word: String): Int =
    if (word.length < 5) 0 else if (word.length < 9) 1 else 2
}
