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

  /** Prefix-accepting distance: min edit distance between `query` and
    * ANY prefix of `value` — exactly what the reference's
    * `build_prefix_dfa(query)` accepts when run over the facet FST
    * (build_dfa(is_prefix=true), milli/src/search/mod.rs:374-386;
    * facet search at search/facet/search.rs:152-160). One DP over
    * query rows; the answer is the min of the final row (each column j
    * is the distance to value[0..j)). */
  def prefixDistance(value: String, query: String): Int = {
    if (query.isEmpty) return 0
    if (value.isEmpty) return query.length
    var prev = Array.tabulate(value.length + 1)(identity)
    var cur = new Array[Int](value.length + 1)
    var i = 1
    while (i <= query.length) {
      cur(0) = i
      var j = 1
      while (j <= value.length) {
        val cost = if (query.charAt(i - 1) == value.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev.min
  }

  /** The reference's per-word typo budget: 0 if len<5, 1 if len<9,
    * else 2 (parse_query.rs:194-215 with default one_typo=5, two_typo=9
    * thresholds, index.rs:36-37). */
  def budgetFor(word: String): Int =
    if (word.length < 5) 0 else if (word.length < 9) 1 else 2
}
