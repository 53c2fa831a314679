package graft.rank

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Tokenizer
import graft.search.{Levenshtein, SearchEngine}
import graft.index.IndexBuild

/** One query term slot with its derivations (reference QueryTerm:
  * zero-typo / one-typo / two-typo derivation sets,
  * query_term/compute_derivations.rs:26-43). */
final case class Slot(idx: Int, original: String,
                      derivations: Seq[(String, Int)], // (term, typoCost)
                      /** split-word derivation: the word written as two
                        * adjacent dictionary words ("quickbrown" ->
                        * quick+brown), costing one typo (reference
                        * split_best_frequency,
                        * query_term/compute_derivations.rs:388-408) */
                      split: Option[(String, String)] = None)

/** The Meilisearch ranking-rule cascade, re-expressed as one multi-column
  * sort (reference: bucket_sort.rs:21-286 recursive bucket refinement ==
  * lexicographic sort on per-rule rank columns; criterion.rs:82-91
  * default order words, typo, proximity, attribute, sort, exactness).
  *
  * Per-rule rank construction mirrors score_details.rs:
  *  - words: rank = matched-prefix length (TermsMatchingStrategy::Last
  *    removes terms from the end, search/new/mod.rs:219-248)
  *  - typo: cost = Σ typo cost of the cheapest matching derivation per
  *    slot; budget 0/1/2 by word length (parse_query.rs:194-215); a
  *    first-letter typo counts as one extra (compute_derivations.rs
  *    first-letter trick)
  *  - proximity: cost = Σ over consecutive matched slots of the
  *    asymmetric pair distance clamped to [1,7], 8 when absent
  *    (proximity.rs:7-15, extract MAX_DISTANCE 8 exclusive)
  *  - attribute/position: cost = Σ bucketed first position per slot
  *    (ranking_rule_graph/position cost table ~ log buckets,
  *    lib.rs:213-225)
  *  - exactness: exact-attribute bucket 3/2/1 (whole-field exact /
  *    starts-with / other, exact_attribute.rs:11-50) then count of
  *    words matched by their exact form (exactness/mod.rs:19-92)
  *
  * The global score merges consecutive (rank, maxRank) pairs mixed-radix
  * (score_details.rs:420-429): merge(outer, inner) =
  * ((outer.rank-1)*inner.maxRank + inner.rank) / (outer.max*inner.max) —
  * computed here as integer Column arithmetic, so it is exact.
  */
final class MeiliRank(engine: SearchEngine,
                      synonyms: Map[String, Seq[String]] = Map.empty) {
  private val spark = engine.spark
  import spark.implicits._

  /** Analyze a query into slots with typo-budgeted derivations against
    * the broadcast dictionary (the FST analogue). Synonyms expand
    * query-side only, at typo cost 0 but non-exact (reference X4,
    * compute_derivations.rs:223-241). */
  def analyze(q: String, lastIsPrefix: Boolean = false): Seq[Slot] = {
    val words = Tokenizer.terms(q)
    words.zipWithIndex.map { case (w, i) =>
      val budget = Levenshtein.budgetFor(w)
      val derivs = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      if (engine.dict.contains(w)) derivs(w) = 0
      synonyms.getOrElse(w, Nil).foreach { s =>
        val sn = Tokenizer.normalize(s)
        if (engine.dict.contains(sn) && !derivs.contains(sn)) derivs(sn) = 0
      }
      // prefix expansion for the last word (cost 0, reference X5)
      if (lastIsPrefix && i == words.length - 1)
        engine.prefixTerms(w).foreach(t => if (!derivs.contains(t)) derivs(t) = 0)
      if (budget > 0) {
        engine.sortedTerms.foreach { t =>
          if (!derivs.contains(t) && math.abs(t.length - w.length) <= budget) {
            val d = Levenshtein(w, t)
            if (d > 0 && d <= budget) {
              // first-letter typo counts as one extra typo
              val eff = if (t.head != w.head) d + 1 else d
              if (eff <= budget) derivs(t) = eff
            }
          }
        }
      }
      val split = if (derivs.isEmpty) splitBest(w) else None
      Slot(i, w, derivs.toSeq, split)
    }
  }

  /** Best (l, r) split of an unknown word into two dictionary words, by
    * frequency of their adjacency (pair proximity 1) — reference
    * split_best_frequency. Ties break toward the lexicographically
    * smallest left part (deterministic). */
  def splitBest(word: String): Option[(String, String)] = {
    val cands = (1 until word.length)
      .map(i => (word.substring(0, i), word.substring(i)))
      .filter { case (l, r) => engine.dict.contains(l) && engine.dict.contains(r) }
      .sortBy(_._1)
    if (cands.isEmpty) None
    else if (cands.size == 1) Some(cands.head)
    else {
      val counted = cands.map { case (l, r) =>
        ((l, r), engine.phrase(Seq(l, r)).count())
      }
      val best = counted.maxBy(_._2) // stable: first max in sorted order
      if (best._2 > 0) Some(best._1) else Some(counted.head._1)
    }
  }

  /** (docId, slot, typoCost, exact) rows: min-cost derivation per slot
    * per doc, from one bucket-pruned postings scan. */
  private def slotMatches(slots: Seq[Slot]): DataFrame = {
    val derivRows = slots.flatMap(s => s.derivations.map { case (t, c) =>
      (t, s.idx, c, if (t == s.original) 1 else 0)
    })
    val empty = spark.range(0)
      .select($"id".cast("int").as("docId"), lit(0).as("slot"),
        lit(0).as("typoCost"), lit(0).as("exact"))
    if (derivRows.isEmpty && slots.forall(_.split.isEmpty)) return empty
    val direct = if (derivRows.isEmpty) empty else {
      val dt = derivRows.toDF("term", "slot", "cost", "isExact")
      val terms = derivRows.map(_._1).distinct
      val qts = terms.map(t => graft.search.QueryTerm(t, engine.dict(t), 0.0,
        IndexBuild.bucketOf(t, engine.termBuckets)))
      engine.decoded(qts).toDF()
        .join(broadcast(dt), Seq("term"))
        .groupBy($"docId", $"slot")
        .agg(min($"cost").as("typoCost"), max($"isExact").as("exact"))
    }
    // split-word derivations: the slot matches where l and r occur
    // adjacently; counts as one typo, never exact
    val splitDfs = slots.collect { case s if s.split.isDefined =>
      val (l, r) = s.split.get
      engine.phrase(Seq(l, r))
        .select($"docId", lit(s.idx).as("slot"),
          lit(1).as("typoCost"), lit(0).as("exact"))
    }
    splitDfs.foldLeft(direct)((acc, d) => acc.unionByName(d))
      .groupBy($"docId", $"slot")
      .agg(min($"typoCost").as("typoCost"), max($"exact").as("exact"))
  }

  /** (docId, slot, pos) exploded positions for all derivations (split
    * derivations contribute the left word's positions). */
  private def slotPositions(slots: Seq[Slot]): DataFrame = {
    val derivRows = slots.flatMap(s => s.derivations.map(d => (d._1, s.idx)) ++
      s.split.map(sp => (sp._1, s.idx)))
    val dt = derivRows.toDF("term", "slot")
    engine.positionsFor(derivRows.map(_._1).distinct)
      .join(broadcast(dt), Seq("term"))
      .select($"docId", $"slot", explode($"positions").as("pos"))
  }

  /** Ranked search: returns (docId, wordsRank, typoCost, proxCost,
    * posCost, exactAttr, exactWords, rankingScore, plus doc columns),
    * ordered by the rule cascade with ascending-docId tie-break. */
  def search(q: String, k: Int,
             filterExpr: Option[String] = None,
             sortBy: Option[(String, Boolean)] = None,
             distinct: Option[String] = None,
             lastIsPrefix: Boolean = false): DataFrame = {
    val slots = analyze(q, lastIsPrefix)
    val n = slots.length
    if (n == 0 || slots.forall(s => s.derivations.isEmpty && s.split.isEmpty))
      return engine.docs.limit(0)
        .select($"docId", lit(0).as("rankingScore"))
    val matches = slotMatches(slots)

    // words rank: longest fully-matched prefix of slots (strategy Last)
    val slotsArr = sort_array(collect_list(struct($"slot", $"typoCost", $"exact")))
    val perDoc = matches.groupBy($"docId").agg(slotsArr.as("sl"))
      .withColumn("wordsRank",
        aggregate(sequence(lit(0), lit(n - 1)), lit(0),
          (acc, i) => when(acc === i &&
            exists($"sl", x => x.getField("slot") === i), acc + 1).otherwise(acc)))
      .filter($"wordsRank" >= 1)
      // typo cost over the matched prefix only
      .withColumn("typoCost",
        aggregate(filter($"sl", x => x.getField("slot") < $"wordsRank"),
          lit(0), (acc, x) => acc + x.getField("typoCost")))
      .withColumn("exactWords",
        aggregate(filter($"sl", x => x.getField("slot") < $"wordsRank"),
          lit(0), (acc, x) => acc + x.getField("exact")))

    // proximity: min pair distance per consecutive slot pair, within the
    // matched prefix; absent pair (beyond cap) costs 8
    val withProx = if (n >= 2) {
      val pos = slotPositions(slots)
      val a = pos.toDF("docId", "s1", "p1")
      val b = pos.toDF("docId", "s2", "p2")
      val pairs = a.join(b, Seq("docId"))
        .where($"s2" === $"s1" + 1)
        .withColumn("d",
          when($"p2" > $"p1", $"p2" - $"p1").otherwise($"p1" - $"p2" + 1))
        .groupBy($"docId", $"s1")
        .agg(least(min($"d"), lit(8)).as("pairProx"))
        .groupBy($"docId")
        .agg(sort_array(collect_list(struct($"s1", $"pairProx"))).as("pp"))
      perDoc.join(pairs, Seq("docId"), "left")
        .withColumn("proxCost",
          when($"wordsRank" < 2, lit(0)).otherwise(
            aggregate(sequence(lit(0), $"wordsRank" - 2), lit(0), (acc, i) =>
              acc + coalesce(
                element_at(map_from_entries($"pp"), i), lit(8)))))
        .drop("pp")
    } else perDoc.withColumn("proxCost", lit(0))

    // attribute/position: sum of bucketed first positions over the prefix
    val posRank = {
      val pos = slotPositions(slots)
      val bucketUdf = udf((p: Int) => Tokenizer.bucketPosition(p))
      pos.groupBy($"docId", $"slot").agg(min($"pos").as("minPos"))
        .withColumn("posBucket", bucketUdf($"minPos"))
        .groupBy($"docId")
        .agg(sort_array(collect_list(struct($"slot", $"posBucket"))).as("pb"),
          min(when($"slot" === 0, $"minPos")).as("firstSlotPos"))
    }
    val withPos = withProx.join(posRank, Seq("docId"), "left")
      .withColumn("posCost",
        aggregate(filter(coalesce($"pb", array()),
          x => x.getField("slot") < $"wordsRank"),
          lit(0), (acc, x) => acc + x.getField("posBucket")))

    // exactness: whole-attribute exact (len == n and phrase at pos 0),
    // starts-with, other
    val phraseStart = withPos
      .join(engine.docs.select($"docId", $"len"), Seq("docId"))
      .withColumn("startsWithQuery",
        $"wordsRank" === n && $"exactWords" === n && $"firstSlotPos" === 0 &&
          $"proxCost" <= (n - 1)) // all pairs adjacent
      .withColumn("exactAttr",
        when($"startsWithQuery" && $"len" === n, 3)
          .when($"startsWithQuery", 2)
          .otherwise(1))

    // ---- rank columns -> mixed-radix global score ----------------------
    val maxTypo = slots.map(s => Levenshtein.budgetFor(s.original)).sum
    val maxProx = 8 * math.max(n - 1, 0)
    val maxPos = 48 * n
    val rules: Seq[(Column, Int)] = Seq( // (rank, maxRank) per rule
      ($"wordsRank", n),
      (lit(maxTypo + 1) - $"typoCost", maxTypo + 1),
      (lit(maxProx + 1) - $"proxCost", maxProx + 1),
      (lit(maxPos + 1) - least($"posCost", lit(maxPos)), maxPos + 1),
      ($"exactAttr", 3),
      ($"exactWords" + 1, n + 1))
    val (mergedRank, mergedMax) = rules.foldLeft((lit(1L): Column, 1L)) {
      case ((accR, accM), (r, m)) =>
        ((accR - 1L) * m + r.cast("long"), accM * m)
    }
    val scored = phraseStart
      .withColumn("rankingScore", mergedRank.cast("double") / lit(mergedMax.toDouble))

    // filter / distinct / sort / top-k
    val filtered = filterExpr match {
      case Some(f) => scored.join(
        engine.docs.filter(graft.query.FilterParser.parse(f)).select($"docId"),
        Seq("docId"), "left_semi")
      case None => scored
    }
    val sortCols: Seq[Column] = sortBy match {
      case Some((col0, asc)) =>
        // user sort slots between attribute and exactness (criterion.rs)
        Seq($"wordsRank".desc, $"typoCost".asc, $"proxCost".asc, $"posCost".asc,
          if (asc) col(col0).asc_nulls_last else col(col0).desc_nulls_last,
          $"exactAttr".desc, $"exactWords".desc, $"docId".asc)
      case None =>
        Seq($"wordsRank".desc, $"typoCost".asc, $"proxCost".asc, $"posCost".asc,
          $"exactAttr".desc, $"exactWords".desc, $"docId".asc)
    }
    val withMeta = filtered.join(engine.docs.drop("len"), Seq("docId"))
    val ordered = distinct match {
      case Some(dcol) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(dcol)).orderBy(sortCols: _*)
        withMeta.withColumn("_rn", row_number().over(w)).where($"_rn" === 1).drop("_rn")
      case None => withMeta
    }
    ordered.orderBy(sortCols: _*).limit(k)
      .select($"docId", $"wordsRank", $"typoCost", $"proxCost", $"posCost",
        $"exactAttr", $"exactWords", $"rankingScore", $"repo", $"path", $"lang")
  }
}

object MeiliRank {
  /** Pure mixed-radix rank merge (score_details.rs:408-429): global
    * score from ordered (rank, maxRank) pairs. */
  def mergeRanks(ranks: Seq[(Long, Long)]): Double = {
    val (r, m) = ranks.foldLeft((1L, 1L)) { case ((ar, am), (rk, mx)) =>
      ((ar - 1) * mx + rk, am * mx)
    }
    r.toDouble / m.toDouble
  }
}
