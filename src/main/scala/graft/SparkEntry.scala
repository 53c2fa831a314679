package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{Geo, JsonText}
import graft.ops.{Dedup, Multimodal, Similarity, TextMetrics}
import graft.streaming.Events

/** Driver contract: one entry per implemented operator (SURVEY.md §2),
  * each with a DuckDB-equivalent oracle where SQL can express it.
  *
  * Shared tokenization spec between engine and oracles: lowercase,
  * split on non-[a-z0-9] runs, drop empties (Tokenizer.simpleTerms).
  * On the driver `documents` corpus this equals the engine's full
  * charabia-style tokenizer (pure lowercase alpha vocabulary), so the
  * inverted-index path itself is oracle-checked.
  *
  * Score determinism: BM25 scores are rounded to 1e-6 and ordered by
  * (rounded score desc, doc_id asc) on BOTH sides; vector dot products
  * are integer fixed-point (see ops.Similarity).
  */
object SparkEntry {

  /** Flagship query on sf=0.001: build/reuse the inverted index over
    * `documents` and run a ranked conjunctive BM25 search. */
  def entry(spark: SparkSession): DataFrame = {
    val e = DocIndex.engine(spark, "/root/testdata/sf0.001")
    e.searchHits("batch stream", 10)
  }

  /** /tmp side-index tag for a testdata dir (shared by every query
    * that builds its own index). */
  private def dirTag(dir: String): String = dir.replaceAll("[^a-zA-Z0-9.]+", "_")

  /** Construction-time SearchEngine cache for the /tmp side indexes
    * (index METADATA and table readers only — never query results; every
    * query still computes from the index parquet). An engine eagerly
    * collects stats/dict/settings at construction — ~6 driver-collect
    * jobs — and each side index here is immutable once its lineage-
    * committed build finishes, so re-reading that metadata on every
    * call is pure job-dispatch overhead. Same pattern as
    * [[DocIndex.engine]], which has always cached the main index's
    * engine. Keyed by session (a fresh session must not see another
    * session's plans); bounded LRU so long test runs with many
    * sessions stay bounded. Callers must only cache an engine AFTER
    * all mutating stages (build/delete) of the call path have run —
    * every site below constructs the engine at that point already. */
  private val engineLru = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(SparkSession, String), graft.search.SearchEngine](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), graft.search.SearchEngine])
          : Boolean = size() > 32
    })
  private def cachedEngine(s: SparkSession, dir: String): graft.search.SearchEngine = {
    val k = (s, dir)
    val hit = engineLru.get(k)
    if (hit != null) hit
    else {
      val e = new graft.search.SearchEngine(s, dir)
      engineLru.put(k, e)
      e
    }
  }

  private def docsDf(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embDf(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  private def eventsDf(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  /** Two-field (title weight 0, body weight 1) side index shared by the
    * multifield and ByAttribute-proximity queries. Synthetic title:
    * every 7th doc gets 'spark boost' (so the fid rule reorders
    * body-only matches below title matches); `lang` (pure alpha) as the
    * non-boost title — the shared tokenization spec breaks on
    * digit-bearing values like 'src3'. Lineage-committed: cheap rerun. */
  private def mfIndexDir(s: SparkSession, dir: String): String = {
    val idxDir = s"/tmp/graft-mfidx-v2/${dirTag(dir)}"
    val src = docsDf(s, dir).select(col("doc_id"),
      when(col("doc_id") % 7 === 0, lit("spark boost"))
        .otherwise(col("lang")).as("title"),
      col("text").as("body"), col("lang"), col("source"))
    graft.index.IndexBuild.buildMultiField(s, src, "doc_id",
      fields = Seq(("title", 0), ("body", 1)), langCol = "lang",
      sourceCol = "source", indexDir = idxDir,
      cfg = graft.index.IndexConfig(docsPerShard = 512, termBuckets = 4,
        blockSize = 128, numPartitions = 8, positions = true))
    idxDir
  }

  /** Persisted bucket-partitioned LSH index over the sf dir's
    * embeddings, built once (the ANN scale path: queries read only
    * probed bucket partitions). Shared by q_knn_lsh and the hybrid
    * semantic-arm routing. */
  private def lshIndexDir(s: SparkSession, dir: String): String = {
    // v3: byid carries (vec, nn) so the query-row lookup is one scan
    val idxDir = s"/tmp/graft-lshidx-v3/${dirTag(dir)}"
    if (!new java.io.File(s"$idxDir/meta/_SUCCESS").exists())
      graft.ops.Similarity.buildLshIndex(s, embDf(s, dir), "vec_id", "embedding",
        idxDir, nPlanes = 4)
    idxDir
  }

  /** The q_hybrid_vec external query vector: 64 dims of exactly-
    * representable eighths, so the Spark FLOAT literal and the DuckDB
    * DOUBLE literal below are the same real number bit-for-bit (the
    * fixed-point dot contract then makes scores engine-identical). */
  private val ExtQueryVec: Array[Float] =
    Array.tabulate(64)(d => (((d * 37 + 11) % 17) - 8) / 8.0f)

  /** [[ExtQueryVec]] as DuckDB VALUES rows `(i, qx)`. */
  private def extQueryVecSql: String =
    ExtQueryVec.zipWithIndex
      .map { case (v, i) => s"($i, ${v.toDouble})" }.mkString(", ")

  /** The LSH hyperplane family as DuckDB VALUES rows `(p, i, w)` —
    * the q_knn_lsh oracle recomputes bucket assignment from the same
    * constants the index build used (Similarity.planeWeight). */
  private def lshPlaneValues(nPlanes: Int, dim: Int, seed: Long): String =
    (for (p <- 0 until nPlanes; d <- 0 until dim)
      yield s"($p, $d, ${graft.ops.Similarity.planeWeight(seed, p, d)})")
      .mkString(", ")

  /** documents + deterministic synthetic `_geo_lat`/`_geo_lng` fields
    * (the corpus has no geo columns; identical doc_id-derived formula in
    * the DuckDB oracle). Lat in [-80, 80), lng in [-170, 170). */
  private def geoDocs(s: SparkSession, dir: String): DataFrame =
    docsDf(s, dir).select(col("doc_id"),
      (col("doc_id") * 37 % 1601 / 10.0 - 80.0).as(Geo.LatCol),
      (col("doc_id") * 73 % 3401 / 10.0 - 170.0).as(Geo.LngCol))

  /** searchDF + the deterministic rounding/ordering contract. */
  private def rankedSearch(s: SparkSession, dir: String, q: String,
                           conjunctive: Boolean, k: Int): DataFrame = {
    val e = DocIndex.engine(s, dir)
    e.searchDF(q, 1000000, conjunctive)
      .select(col("docId").cast("long").as("doc_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- index build artifacts (A1/A2: posting-list GROUP BYs) -------
    "q_dict" -> ((s, dir) => {
      val e = DocIndex.engine(s, dir)
      s.read.parquet(s"${e.indexDir}/dict").select(col("term"), col("df"), col("cf"))
        .orderBy(col("term"))
    }),
    "q_doclen" -> ((s, dir) => {
      val e = DocIndex.engine(s, dir)
      e.doclen.select(col("docId").cast("long").as("doc_id"), col("len").cast("long").as("len"))
        .orderBy(col("doc_id"))
    }),
    "q_stats" -> ((s, dir) => {
      val e = DocIndex.engine(s, dir)
      e.doclen.agg(count(lit(1)).as("n_docs"),
        round(avg(col("len")), 6).as("avgdl"))
    }),
    // ---- ranked retrieval (R*/T1: BM25 top-k) ------------------------
    "q_bm25_and" -> ((s, dir) => rankedSearch(s, dir, "spark merge", true, 20)),
    "q_bm25_or" -> ((s, dir) => rankedSearch(s, dir, "batch stream window", false, 20)),
    "q_bm25_filter" -> ((s, dir) => {
      val e = DocIndex.engine(s, dir)
      e.searchDF("data table", 1000000, conjunctive = true,
          candidates = Some(e.docs.filter(graft.query.FilterParser.parse("lang = en"))))
        .select(col("docId").cast("long").as("doc_id"),
          round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
    }),
    // ---- facets (A3/A4), sort (R5), distinct (A8) --------------------
    "q_facet_lang" -> ((s, dir) =>
      DocIndex.engine(s, dir).facetDistribution("batch", "lang")
        .select(col("lang"), col("n"))),
    // sortFacetValuesBy=alpha (the reference's per-facet DEFAULT,
    // facet_values_sort.rs): lexicographic value order, count payload
    "q_facet_alpha" -> ((s, dir) => {
      val e = DocIndex.engine(s, dir)
      e.facetCountsOver(e.candidates("batch"), "lang", maxValues = 3,
          sortBy = "alpha")
        .select(col("lang"), col("n"))
    }),
    "q_facet_stats" -> ((s, dir) =>
      DocIndex.engine(s, dir)
        .facetStats("batch", length(col("content")), "nchars")),
    // ---- persisted facet index: range distribution (U4) -----------------
    "q_facet_range" -> ((s, dir) =>
      DocIndex.engine(s, dir)
        .facetIndex("len", col("value").between(40, 80))
        .select(col("value").cast("long").as("value"), col("n"))
        .orderBy(col("value"))),
    "q_sort" -> ((s, dir) => {
      val e = DocIndex.engine(s, dir)
      e.docs.join(broadcast(e.candidates("window")), Seq("docId"), "left_semi")
        .select(col("docId").cast("long").as("doc_id"),
          length(col("content")).cast("long").as("n_chars_m"))
        .orderBy(col("n_chars_m").desc, col("doc_id").asc)
        .limit(30)
    }),
    "q_distinct" -> ((s, dir) => {
      val e = DocIndex.engine(s, dir)
      val scored = e.searchDF("spark", 1000000, conjunctive = true)
        .select(col("docId").cast("long").as("doc_id"),
          round(col("score"), 6).as("score"))
        .join(e.docs.select(col("docId").cast("long").as("doc_id"),
          col("repo").as("source")), Seq("doc_id"))
      // per-source winner by (score desc, doc_id asc) as ONE map-side-
      // combinable max_by aggregation (guide §2.3: aggregate before you
      // shuffle) — the previous row_number window shipped every scored
      // row through a sort exchange to pick one row per source. The
      // ordering struct is unique per row (doc_id is a key), so the
      // winner is deterministic and identical to the window's rn=1.
      scored.groupBy(col("source"))
        .agg(max_by(struct(col("doc_id"), col("score")),
          struct(col("score"), (-col("doc_id")).as("nd"))).as("b"))
        .select(col("source"), col("b.doc_id").as("doc_id"),
          col("b.score").as("score"))
        .orderBy(col("source"))
    }),
    // ---- words / phrase / proximity / negative / prefix / typo -------
    "q_words_count" -> ((s, dir) => {
      val e = DocIndex.engine(s, dir)
      e.decoded(e.analyze("batch stream window")).toDF()
        .groupBy(col("docId").cast("long").as("doc_id"))
        .agg(countDistinct(col("term")).as("n_matched"))
        .orderBy(col("doc_id"))
    }),
    "q_phrase" -> ((s, dir) =>
      DocIndex.engine(s, dir).phrase(Seq("batch", "batch"))
        .select(col("docId").cast("long").as("doc_id")).orderBy(col("doc_id"))),
    "q_proximity" -> ((s, dir) =>
      DocIndex.engine(s, dir).proximity("spark", "merge")
        .select(col("docId").cast("long").as("doc_id"), col("prox")).orderBy(col("doc_id"))),
    "q_negative" -> ((s, dir) =>
      DocIndex.engine(s, dir).negative("batch", "stream")
        .select(col("docId").cast("long").as("doc_id")).orderBy(col("doc_id"))),
    "q_prefix" -> ((s, dir) =>
      DocIndex.engine(s, dir).prefixSearch("s")
        .select(col("docId").cast("long").as("doc_id"), col("nTerms").as("n_terms"))
        .orderBy(col("doc_id"))),
    "q_typo" -> ((s, dir) =>
      DocIndex.engine(s, dir).typoSearch("sparkz", 1)
        .select(col("docId").cast("long").as("doc_id"), col("nTerms").as("n_terms"))
        .orderBy(col("doc_id"))),
    // ---- dedup family -------------------------------------------------
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docsDf(s, dir), "doc_id", "text").orderBy(col("h"))),
    "q_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(docsDf(s, dir), "doc_id", "text", 3, 0.2)
        .orderBy(col("a"), col("b"))),
    "q_minhash" -> ((s, dir) =>
      Dedup.minhashSignatures(docsDf(s, dir), "doc_id", "text", 3, 4)
        .orderBy(col("id"))),
    "q_lsh_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairs(docsDf(s, dir), "doc_id", "text", 3, 4, 2)
        .orderBy(col("a"), col("b"))),
    "q_simhash" -> ((s, dir) =>
      Dedup.simhash16(docsDf(s, dir), "doc_id", "text").orderBy(col("id"))),
    "q_simhash64" -> ((s, dir) =>
      Dedup.simhash64(docsDf(s, dir), "doc_id", "text").orderBy(col("id"))),
    // ---- text metrics --------------------------------------------------
    "q_quality" -> ((s, dir) =>
      TextMetrics.quality(docsDf(s, dir), "doc_id", "text").orderBy(col("id"))),
    "q_langid" -> ((s, dir) =>
      TextMetrics.langId(docsDf(s, dir), "doc_id", "text").orderBy(col("id"))),
    "q_fingerprint" -> ((s, dir) =>
      TextMetrics.fingerprint(docsDf(s, dir), "doc_id", "text").orderBy(col("id"))),
    "q_tokens" -> ((s, dir) =>
      TextMetrics.tokenEstimate(docsDf(s, dir), "doc_id", "text").orderBy(col("id"))),
    // ---- similarity search ---------------------------------------------
    "q_knn" -> ((s, dir) =>
      Similarity.cosineTopK(embDf(s, dir), "vec_id", "embedding", 0L, 10)),
    // embedding-cosine near-dup pairs: exact all-pairs baseline (oracle
    // setting; the scale path is cosineNearDupPairsLsh, recall-spec'd)
    "q_neardup" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(embDf(s, dir), "vec_id", "embedding", 0.4)
        .orderBy(col("a"), col("b"))),
    // multi-probe top-k against the persisted bucket-partitioned LSH
    // index; fully oracle-checked — the DuckDB SQL recomputes the
    // fixed-point bucket assignment from the same plane literals,
    // mirrors the Hamming<=2 probe set, and re-ranks exactly
    "q_knn_lsh" -> ((s, dir) =>
      Similarity.lshIndexTopK(s, lshIndexDir(s, dir), 0L, 10)),
    // similar-documents facade (reference GET /indexes/{uid}/similar,
    // similar.rs): cosine neighbours of doc 3, excluding itself,
    // restricted to the filter universe (the target itself is zh — the
    // reference does not require the target to match the filter)
    "q_similar" -> ((s, dir) => {
      val idx = new graft.api.Index(DocIndex.engine(s, dir))
      idx.similar(embDf(s, dir), "vec_id", "embedding", id = 3L,
          limit = 10, filter = Some("lang = 'en'"),
          semanticIndexDir = Some(lshIndexDir(s, dir)))
        .select(col("docId").cast("long").as("doc_id"), col("score"))
    }),
    // ---- Meilisearch rule cascade (R1-R6 + mixed-radix score) ----------
    "q_meili_rank" -> ((s, dir) => meiliQuery(s, dir, "spark merge batch")),
    // showRankingScoreDetails (score_details.rs:145-302): details_score
    // is recomputed FROM THE DETAILS COLUMN ALONE (mixed-radix over the
    // per-rule rank/maxRank fields) — the oracle's independently
    // reconstructed ranking_score must match it exactly
    "q_score_details" -> ((s, dir) => {
      val mr = new graft.rank.MeiliRank(DocIndex.engine(s, dir))
      val d = col("_rankingScoreDetails")
      def f(rule: String, field: String) =
        d.getField(rule).getField(field).cast("long")
      val ranks = Seq(
        (f("words", "matchingWords"), f("words", "maxMatchingWords")),
        (f("typo", "maxTypoCount") + 1 - f("typo", "typoCount"),
          f("typo", "maxTypoCount") + 1),
        (f("proximity", "rank"), f("proximity", "maxRank")),
        (f("attribute", "fidRank"), f("attribute", "fidMaxRank")),
        (f("attribute", "posRank"), f("attribute", "posMaxRank")),
        (f("exactness", "exactAttrRank"), f("exactness", "exactAttrMaxRank")),
        (f("exactness", "matchedWords") + 1,
          f("exactness", "maxMatchedWords") + 1))
      val (r, m) = ranks.foldLeft((lit(1L): org.apache.spark.sql.Column,
          lit(1L): org.apache.spark.sql.Column)) {
        case ((ar, am), (rk, mx)) => ((ar - 1L) * mx + rk, am * mx)
      }
      meiliCols(mr.search("spark merge", 50, withScoreDetails = true),
        (r.cast("double") / m.cast("double")).as("details_score"))
    }),
    "q_meili_typo" -> ((s, dir) => meiliQuery(s, dir, "spork merge")),
    // 2-gram merge: neither 'win' nor 'dow' is a vocab term; the merged
    // compound 'window' matches both slots at ngram cost 1
    "q_meili_ngram" -> ((s, dir) => meiliQuery(s, dir, "win dow")),
    // ---- words-rule matching strategies (R1: All / Frequency) ----------
    "q_tms_all" -> ((s, dir) =>
      meiliQuery(s, dir, "spark merge batch", strategy = graft.rank.TermsMatching.All)),
    "q_tms_freq" -> ((s, dir) =>
      meiliQuery(s, dir, "spark window merge", strategy = graft.rank.TermsMatching.Frequency)),
    // ---- rankingScoreThreshold (reference bucket_sort.rs:242-258) -------
    "q_threshold" -> ((s, dir) =>
      meiliQuery(s, dir, "spark merge", scoreThreshold = Some(0.5))),
    // ---- sort rule inside the cascade (R5: slots between attribute and
    // exactness, criterion.rs) --------------------------------------------
    "q_sort_rule" -> ((s, dir) => {
      val mr = new graft.rank.MeiliRank(DocIndex.engine(s, dir))
      meiliCols(mr.search("spark merge", 50, sortBy = Some(("lang", true))),
        col("lang"))
    }),
    // ---- synonyms (X4): single-word (cost 0) + multi-word (adjacency) ---
    "q_synonym" -> ((s, dir) =>
      meiliQuery(s, dir, "lookup ts",
        synonyms = Map("lookup" -> Seq("query"), "ts" -> Seq("table scan")))),
    // ---- split-word derivation (A7: unknown compound -> best split) -----
    "q_split" -> ((s, dir) => meiliQuery(s, dir, "sparkmerge batch")),
    // ---- last-word-as-prefix inside the cascade (X5) --------------------
    "q_meili_prefix" -> ((s, dir) =>
      meiliQuery(s, dir, "spark win", lastIsPrefix = true)),
    // ---- query-string syntax: phrase + negative in one query -----------
    "q_mixed" -> ((s, dir) => {
      val e = DocIndex.engine(s, dir)
      e.searchDF("batch -stream \"spark merge\"", 1000000, conjunctive = true)
        .select(col("docId").cast("long").as("doc_id"),
          round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
    }),
    // ---- typo-tolerant facet-value search -------------------------------
    "q_facet_search" -> ((s, dir) =>
      DocIndex.engine(s, dir) // buildFromTable maps source -> repo
        .facetSearch("batch", "repo", "srcc1", typoTolerant = true)
        .select(col("value"), col("n"))),
    // ---- hybrid keyword + semantic merge (R8) ---------------------------
    "q_hybrid" -> ((s, dir) => {
      val mr = new graft.rank.MeiliRank(DocIndex.engine(s, dir))
      // semantic arm cost-routed: the persisted LSH index is supplied,
      // but below SemanticExactMaxRows vectors the exact brute-force
      // path runs (identical to the DuckDB oracle); at scale the SAME
      // call reads only probed bucket partitions of the index
      // explicit full pool: the oracle checks BOTH arms' auxiliary
      // scores for every returned doc, which needs both full orderings;
      // production callers take the default pool = k (Hybrid.search)
      graft.search.Hybrid.search(mr, embDf(s, dir), "vec_id", "embedding",
        "spark merge", queryVecId = 0L, ratio = 0.5, k = 20,
        candidatePool = 1000000,
        semanticIndexDir = Some(lshIndexDir(s, dir)))
        .select(col("docId").cast("long").as("doc_id"),
          col("hybridScore").as("hybrid_score"),
          col("kwScore").as("kw_score"), col("semScore").as("sem_score"))
    }),
    // hybrid with an EXTERNAL query vector (reference SearchQuery.vector
    // mod.rs:64-67): the semantic arm scores against a literal vector
    // that is NOT a corpus row — no query-row lookup anywhere
    "q_hybrid_vec" -> ((s, dir) => {
      val mr = new graft.rank.MeiliRank(DocIndex.engine(s, dir))
      graft.search.Hybrid.searchVec(mr, embDf(s, dir), "vec_id", "embedding",
        "spark merge", ExtQueryVec, ratio = 0.5, k = 20,
        candidatePool = 1000000,
        semanticIndexDir = Some(lshIndexDir(s, dir)))
        .select(col("docId").cast("long").as("doc_id"),
          col("hybridScore").as("hybrid_score"),
          col("kwScore").as("kw_score"), col("semScore").as("sem_score"))
    }),
    // ---- geo filters + geo sort (R7, F-geo) ------------------------------
    "q_geo_radius" -> ((s, dir) =>
      geoDocs(s, dir)
        .filter(graft.query.FilterParser.parse("_geoRadius(40.7, -74.0, 2500000)"))
        .select(col("doc_id"),
          round(Geo.haversineMeters(col(Geo.LatCol), col(Geo.LngCol), 40.7, -74.0), 0)
            .cast("long").as("dist_m"))
        .orderBy(col("doc_id"))),
    "q_geo_sort" -> ((s, dir) =>
      geoDocs(s, dir)
        .filter(graft.query.FilterParser.parse("_geoBoundingBox([60, -20], [10, -120])"))
        .select(col("doc_id"),
          round(Geo.haversineMeters(col(Geo.LatCol), col(Geo.LngCol), 40.7, -74.0), 0)
            .cast("long").as("dist_m"))
        .orderBy(col("dist_m").asc, col("doc_id").asc).limit(50)),
    // ---- nested-JSON flatten (X8 json_to_string) ------------------------
    "q_json" -> ((s, dir) =>
      docsDf(s, dir)
        .select(col("doc_id"),
          to_json(struct(col("lang"), col("source"),
            array(col("lang"), col("source")).as("tags"))).as("js"))
        .select(col("doc_id"), JsonText.jsonToTextCol(col("js")).as("flat"))
        .orderBy(col("doc_id"))),
    // ---- pagination (T2: offset/limit over the ranked stream) -----------
    "q_page" -> ((s, dir) => {
      val e = DocIndex.engine(s, dir)
      e.searchDF("batch stream", 1000000, conjunctive = false)
        .select(col("docId").cast("long").as("doc_id"),
          round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc).limit(40)
        .withColumn("rn",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
        .filter(col("rn") > 20).drop("rn")
    }),
    // ---- deletion: tombstoned docs excluded, Lucene stats (U1 del) ------
    "q_delete" -> ((s, dir) => {
      val idxDir = s"/tmp/graft-delidx-v2/${dirTag(dir)}"
      val first200 = docsDf(s, dir).orderBy(col("doc_id")).limit(200)
      // lineage-committed: repeated calls resume/no-op
      graft.index.IndexBuild.buildFromTable(s, first200,
        docIdCol = "doc_id", contentCol = "text", langCol = "lang",
        sourceCol = "source", indexDir = idxDir,
        cfg = graft.index.IndexConfig(docsPerShard = 64, termBuckets = 4,
          blockSize = 128, numPartitions = 8))
      graft.index.IndexBuild.delete(s, idxDir,
        (0 until 200 by 7).toSeq, "d1")
      cachedEngine(s, idxDir)
        .searchDF("batch stream", 1000000, conjunctive = true)
        .select(col("docId").cast("long").as("doc_id"),
          round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc).limit(20)
    }),
    // ---- field distribution (A5) + exhaustive count (A6) ----------------
    "q_field_dist" -> ((s, dir) => {
      val fd = DocIndex.engine(s, dir).fieldDistribution()
      s.createDataFrame(fd.toSeq.sortBy(_._1)).toDF("field", "n_docs")
        .orderBy(col("field"))
    }),
    "q_total_hits" -> ((s, dir) => {
      val th = DocIndex.engine(s, dir)
        .totalHits("batch stream", conjunctive = false, filter = Some("lang = en"))
      s.createDataFrame(Seq(Tuple1(th))).toDF("total_hits")
    }),
    // distinct-aware exhaustive count (reference applies the distinct
    // rule before counting, search/new/mod.rs:829-842): one hit per
    // distinct value of the attribute across the derivation-aware
    // matched universe
    "q_total_hits_distinct" -> ((s, dir) => {
      val idx = new graft.api.Index(DocIndex.engine(s, dir))
      val th = idx.totalHits(graft.api.SearchRequest(
        q = "batch stream", distinct = Some("repo")))
      s.createDataFrame(Seq(Tuple1(th))).toDF("total_hits")
    }),
    // ---- stop words as an index setting (X3): dropped from dict/
    // postings/positions; surrounding positions and doc len preserved ----
    "q_stopword" -> ((s, dir) => {
      val idxDir = s"/tmp/graft-stopidx-v2/${dirTag(dir)}"
      val sub = docsDf(s, dir).filter(col("doc_id") < 300)
      graft.index.IndexBuild.buildFromTable(s, sub,
        docIdCol = "doc_id", contentCol = "text", langCol = "lang",
        sourceCol = "source", indexDir = idxDir,
        cfg = graft.index.IndexConfig(docsPerShard = 64, termBuckets = 4,
          blockSize = 128, numPartitions = 8, positions = true,
          stopWords = Set("the", "a")))
      val mr = new graft.rank.MeiliRank(cachedEngine(s, idxDir))
      meiliCols(mr.search("the spark merge", 50))
    }),
    // ---- unspaced-script (Thai) dictionary segmentation (X1): the
    // reference's `dictionary` setting fed to charabia's words_dict
    // segmenter. Synthetic Thai corpus derived from doc_id so the
    // DuckDB oracle can rebuild the SAME docs and re-derive the
    // segmentation independently (recursive longest-match CTE); the
    // whole index pipeline (chunked shuffle, VByte blocks, dict stats)
    // runs over the segmented tokens ----------------------------------
    "q_thai_dict" -> ((s, dir) => {
      val idxDir = s"/tmp/graft-thaiidx-v1/${dirTag(dir)}"
      val thaiText = expr(
        "CASE CAST(doc_id % 4 AS INT) " +
          "WHEN 0 THEN 'แมวกินปลา' WHEN 1 THEN 'ปลาทองนอน' " +
          "WHEN 2 THEN 'สวัสดีครับ' ELSE 'กินปลาปลาทอง' END")
      val sub = docsDf(s, dir).filter(col("doc_id") < 400)
        .withColumn("text", thaiText)
      graft.index.IndexBuild.buildFromTable(s, sub,
        docIdCol = "doc_id", contentCol = "text", langCol = "lang",
        sourceCol = "source", indexDir = idxDir,
        cfg = graft.index.IndexConfig(docsPerShard = 64, termBuckets = 4,
          blockSize = 128, numPartitions = 8,
          tokenizer = graft.functions.Tokenizer.TokSettings(dictionary =
            Set("แมว", "กิน", "ปลา", "ปลาทอง", "นอน", "สวัสดี", "ครับ"))))
      s.read.parquet(s"$idxDir/dict").select(col("term"), col("df"), col("cf"))
        .orderBy(col("term"))
    }),
    // ---- multi-field index + fid ranking rule (R4 fid sub-rule) ---------
    "q_multifield" -> ((s, dir) => {
      val mr = new graft.rank.MeiliRank(cachedEngine(s, mfIndexDir(s, dir)))
      meiliCols(mr.search("spark merge", 50), col("fidCost").cast("long").as("fid_cost"))
    }),
    // ---- ProximityPrecision::ByAttribute (proximity.rs:31-37): pair
    // distance collapses to same-field (1) vs different-field (8) ------
    "q_meili_prox_attr" -> ((s, dir) => {
      val mr = new graft.rank.MeiliRank(cachedEngine(s, mfIndexDir(s, dir)),
        proximityPrecision = graft.rank.ProximityPrecision.ByAttribute)
      meiliCols(mr.search("spark merge", 50), col("fidCost").cast("long").as("fid_cost"))
    }),
    // ---- exactAttributes / typoTolerance.disableOnAttributes (reference
    // exact_attributes index.rs:125-126, db_cache.rs:183-205): typo-
    // derived 'spark' (from 'spork') may NOT match inside the title
    // field (fid 0) — docs whose only 'spark' is the synthetic title
    // lose the slot; exact 'merge' matches everywhere -----------------
    "q_meili_exact_attr" -> ((s, dir) => {
      val mr = new graft.rank.MeiliRank(cachedEngine(s, mfIndexDir(s, dir)),
        typo = graft.rank.TypoSettings(exactFids = Set(0)))
      meiliCols(mr.search("spork merge", 50), col("fidCost").cast("long").as("fid_cost"))
    }),
    // ---- federated multi-index search (weighted score merge) -----------
    "q_federation" -> ((s, dir) => {
      val base = s"/tmp/graft-fedidx-v2/${dirTag(dir)}"
      val cfg = graft.index.IndexConfig(docsPerShard = 256, termBuckets = 4,
        blockSize = 128, numPartitions = 8)
      val d = docsDf(s, dir)
      graft.index.IndexBuild.buildFromTable(s, d.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "lang", "source", s"$base/a", cfg)
      graft.index.IndexBuild.buildFromTable(s, d.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", "lang", "source", s"$base/b", cfg)
      val eA = cachedEngine(s, s"$base/a")
      val eB = cachedEngine(s, s"$base/b")
      graft.search.Federation.search(
          Seq(("a", eA, 1.0), ("b", eB, 0.5)), "batch stream", 1000000,
          conjunctive = true)
        .select(col("indexUid").as("index_uid"),
          col("docId").cast("long").as("doc_id"),
          round(col("weightedScore"), 6).as("weighted_score"))
        .orderBy(col("weighted_score").desc, col("index_uid").asc, col("doc_id").asc)
        .limit(30)
    }),
    // ---- dump export -> import -> search roundtrip (S5) ----------------
    "q_dump" -> ((s, dir) => {
      val tag = dir.replaceAll("[^a-zA-Z0-9.]+", "_")
      val dumpDir = s"/tmp/graft-dump-v2/$tag"
      val impDir = s"/tmp/graft-dumpidx-v2/$tag"
      graft.index.Dump.exportDump(s, DocIndex.engine(s, dir).indexDir, dumpDir)
      graft.index.Dump.importDump(s, dumpDir, impDir,
        graft.index.IndexConfig(numPartitions = 8))
      val e = cachedEngine(s, impDir)
      // import reassigns dense docids by (repo, path) rank; `path` holds
      // the original external id, so results map back exactly
      e.searchDF("spark merge", 1000000, conjunctive = true)
        .join(e.docs.select(col("docId"), col("path")), Seq("docId"))
        .select(col("path").cast("long").as("doc_id"),
          round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
    }),
    // ---- work-budget degraded search (T4) -------------------------------
    "q_degraded" -> ((s, dir) => {
      val e = DocIndex.engine(s, dir)
      // 4 shards of 512 docs: degraded at sf>=0.01 (N=5000), exact at
      // sf0.001 (N=500 fits one shard); the oracle mirrors both via the
      // same doc_id < 2048 prefix + a count-derived flag
      val (df, deg) = e.searchDegraded("batch stream", 1000000, maxShards = 4)
      df.select(col("docId").cast("long").as("doc_id"),
          round(col("score"), 6).as("score"), lit(deg).as("degraded"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
    }),
    // ---- streaming-shaped aggregation ----------------------------------
    "q_events_hourly" -> ((s, dir) =>
      Events.hourlyCounts(eventsDf(s, dir))
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("hour"), col("event_type"))),
    // ---- multimodal plumbing (rows-only: stubbed decoder) --------------
    "q_mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(s,
          Multimodal.assetsFromText(docsDf(s, dir), "doc_id", "text"))
        .toDF().select(col("assetId").as("asset_id"), col("kind"),
          col("byteLen").cast("long").as("byte_len"), col("sha"))
        .orderBy(col("asset_id"))),
    "q_mm_frames" -> ((s, dir) => {
      val f = Multimodal.extractFeatures(s,
        Multimodal.assetsFromText(docsDf(s, dir), "doc_id", "text"))
      Multimodal.sampleFrames(s, f, 4)
        .select(col("assetId").as("asset_id"),
          col("frameIdx").cast("long").as("frame_idx"))
        .orderBy(col("asset_id"), col("frame_idx"))
    })
  )

  private def meiliQuery(s: SparkSession, dir: String, q: String,
                         strategy: graft.rank.TermsMatching = graft.rank.TermsMatching.Last,
                         scoreThreshold: Option[Double] = None,
                         synonyms: Map[String, Seq[String]] = Map.empty,
                         lastIsPrefix: Boolean = false): DataFrame = {
    val mr = new graft.rank.MeiliRank(DocIndex.engine(s, dir), synonyms = synonyms)
    meiliCols(mr.search(q, 50, strategy = strategy, scoreThreshold = scoreThreshold,
      lastIsPrefix = lastIsPrefix))
  }

  private def meiliCols(df: DataFrame, extra: org.apache.spark.sql.Column*): DataFrame =
    df.select(Seq(col("docId").cast("long").as("doc_id"),
      col("wordsRank").cast("long").as("words_rank"),
      col("typoCost").cast("long").as("typo_cost"),
      col("proxCost").cast("long").as("prox_cost"),
      col("posCost").cast("long").as("pos_cost"),
      col("exactAttr").cast("long").as("exact_attr"),
      col("exactWords").cast("long").as("exact_words"),
      col("rankingScore").as("ranking_score")) ++ extra: _*)

  /** DuckDB oracle for the rule cascade: same slot/derivation/typo-
    * budget/proximity/position/exactness logic in pure SQL (integers
    * end-to-end, so the comparison is exact).
    *
    * Generalized over the engine's settings surface:
    *  - `strategy`: the words-rule keep-order permutation ("last" =
    *    query order; "frequency" = ascending document frequency with
    *    slot tie-break, mirroring MeiliRank's kposArr; "all" filters to
    *    words_rank == n)
    *  - `synonyms`: slot word → expansions; single-word expansions are
    *    cost-0 derivations, multi-word expansions match by adjacency
    *    (cost 0, positions from the first word — slotPositions)
    *  - `splits`: slot → split-word pair (cost-1 adjacency match,
    *    MeiliRank.splitBest)
    *  - `tokCte`: tokenization prefix (stop-word oracles swap in a
    *    token stream with stop terms removed but positions/len intact)
    *  - `fidWeightSql`/`maxFid`: multi-field field-weight expression
    *    over the raw fid<<16|pos position; the fid radix digit sits
    *    between proximity and position (identity when maxFid = 0,
    *    matching MeiliRank's single-field degenerate case) */
  private def meiliCtes(words: Seq[String],
                        strategy: String = "last",
                        synonyms: Map[String, Seq[Seq[String]]] = Map.empty,
                        splits: Map[Int, Seq[String]] = Map.empty,
                        tokCte: String = TOK,
                        fidWeightSql: Option[String] = None,
                        maxFid: Int = 0,
                        prefixLast: Boolean = false,
                        proxByAttribute: Boolean = false,
                        exactFids: Set[Int] = Set.empty): String = {
    val budgets = words.map(graft.search.Levenshtein.budgetFor)
    val n = words.length
    // +n: split-word and 2-gram-merge derivations cost 1 beyond the
    // word's own typo budget (mirrors MeiliRank.search maxTypo)
    val maxTypo = budgets.sum + n
    val maxProx = 8 * (n - 1)
    val maxPos = 48 * n
    val maxM = n.toLong * (maxTypo + 1) * (maxProx + 1) * (maxFid + 1) *
      (maxPos + 1) * 3 * (n + 1)
    val qsVals = words.zip(budgets).zipWithIndex
      .map { case ((w, b), i) => s"($i,'$w',$b)" }.mkString(",")
    // keep-order permutation (kpos): Last/All keep query order;
    // Frequency keeps the least document-frequent longest (reference
    // removes the most frequent first, search/new/mod.rs:219-248)
    val kqCte = strategy match {
      case "frequency" =>
        """kq AS (SELECT q.slot, q.w, q.budget,
          |  CAST(row_number() OVER (ORDER BY coalesce(d.df, 0), q.slot) - 1 AS INTEGER) AS kpos
          |  FROM qs q LEFT JOIN dft d ON d.term = q.w)""".stripMargin
      case _ => "kq AS (SELECT slot, w, budget, slot AS kpos FROM qs)"
    }
    // 2-gram merges: the merged compound (if in vocab) covers both
    // slots, cost 1 on the left and 0 on the right, never exact
    val ngramRows = (0 until n - 1).flatMap { i =>
      val m = words(i) + words(i + 1)
      Seq(
        s"SELECT $i AS slot, v.term, 1 AS cost, 0 AS isexact FROM vocab v WHERE v.term = '$m'",
        s"SELECT ${i + 1}, v.term, 0, 0 FROM vocab v WHERE v.term = '$m'")
    }
    // single-word synonym expansions: cost 0, never exact
    val synRows = words.zipWithIndex.flatMap { case (w, i) =>
      synonyms.getOrElse(w, Nil).filter(_.size == 1).map(e =>
        s"SELECT $i AS slot, v.term, 0 AS cost, 0 AS isexact FROM vocab v WHERE v.term = '${e.head}'")
    }
    // last-word-as-prefix: every dictionary term starting with the last
    // word is a cost-0 derivation (exactness still only for the word
    // itself — covered by the base exact row + max(isexact))
    val prefixRows =
      if (!prefixLast) Nil
      else Seq(s"SELECT ${n - 1} AS slot, v.term, 0 AS cost, 0 AS isexact " +
        s"FROM vocab v WHERE v.term LIKE '${words.last}%'")
    val derivUnion = (ngramRows ++ synRows ++ prefixRows) match {
      case Nil => ""
      case rows => rows.mkString(" UNION ALL ", " UNION ALL ", "")
    }
    // phrase derivations: multi-word synonyms (cost 0) and split words
    // (cost 1) match where the words occur adjacently; positions come
    // from the first word (slotPositions)
    val phraseDerivs: Seq[(Int, Seq[String], Int)] =
      words.zipWithIndex.flatMap { case (w, i) =>
        synonyms.getOrElse(w, Nil).filter(_.size > 1).map(ws => (i, ws, 0))
      } ++ splits.toSeq.map { case (i, ws) => (i, ws, 1) }
    def phraseMatch(t: (Int, Seq[String], Int)): String = {
      val (i, ws, cost) = t
      val joins = ws.indices.tail
        .map(j => s"JOIN tok t$j ON t$j.doc_id = t0.doc_id AND t$j.pos = t0.pos + $j")
        .mkString(" ")
      val conds = ws.zipWithIndex.map { case (w, j) => s"t$j.term = '$w'" }.mkString(" AND ")
      s"SELECT DISTINCT t0.doc_id, $i AS slot, $cost AS cost, 0 AS isexact FROM tok t0 $joins WHERE $conds"
    }
    val phmUnion =
      if (phraseDerivs.isEmpty) ""
      else phraseDerivs.map(phraseMatch)
        .mkString("\nUNION ALL SELECT doc_id, slot, cost, isexact FROM (", " UNION ALL ", ")")
    val ppPhrase = phraseDerivs.map { case (i, ws, _) =>
      s" UNION ALL SELECT DISTINCT tok.doc_id, $i AS slot, tok.pos FROM tok WHERE tok.term = '${ws.head}'"
    }.mkString
    val minWr = if (strategy == "all") n else 1
    // exactAttributes (typoTolerance.disableOnAttributes): typo-class
    // derivations (cost > 0) only match at positions OUTSIDE the
    // typo-disabled fids; cost-0 derivations match everywhere — mirrors
    // MeiliRank.slotMatches/slotPositions under TypoSettings.exactFids
    val exactPred =
      if (exactFids.isEmpty) ""
      else s" WHERE d.cost = 0 OR tok.pos // 65536 NOT IN (${exactFids.mkString(", ")})"
    val smSource =
      if (exactFids.isEmpty)
        "tf.doc_id, d.slot, d.cost, d.isexact FROM tf JOIN deriv d USING(term)"
      else "DISTINCT tok.doc_id, d.slot, d.cost, d.isexact " +
        s"FROM tok JOIN deriv d USING(term)$exactPred"
    val minwSel = fidWeightSql.fold("")(e => s", min($e) AS minw")
    val minwPass = if (fidWeightSql.isEmpty) "" else ", minw"
    val fidSel = fidWeightSql.fold("0 AS fid_cost,")(_ =>
      s"""(SELECT coalesce(sum(m.minw),0) FROM mpb m JOIN kq k ON k.slot = m.slot
         |      WHERE m.doc_id = b.doc_id AND k.kpos < b.words_rank) AS fid_cost,""".stripMargin)
    s"""$tokCte,
       |vocab AS (SELECT DISTINCT term FROM tf),
       |qs AS (SELECT * FROM (VALUES $qsVals) t(slot, w, budget)),
       |$kqCte,
       |deriv0 AS (
       |  SELECT q.slot, v.term,
       |    CASE WHEN v.term = q.w THEN 0
       |         WHEN substr(v.term,1,1) = substr(q.w,1,1) THEN levenshtein(v.term,q.w)
       |         ELSE levenshtein(v.term,q.w) + 1 END AS cost,
       |    CASE WHEN v.term = q.w THEN 1 ELSE 0 END AS isexact
       |  FROM vocab v, qs q
       |  WHERE v.term = q.w OR (q.budget > 0
       |    AND abs(length(v.term) - length(q.w)) <= q.budget
       |    AND levenshtein(v.term, q.w) > 0
       |    AND (CASE WHEN substr(v.term,1,1)=substr(q.w,1,1) THEN levenshtein(v.term,q.w) ELSE levenshtein(v.term,q.w)+1 END) <= q.budget)
       |  $derivUnion),
       |deriv AS (SELECT slot, term, min(cost) AS cost, max(isexact) AS isexact
       |  FROM deriv0 GROUP BY 1, 2),
       |sm0 AS (SELECT $smSource$phmUnion),
       |sm AS (SELECT s.doc_id, k.kpos, min(s.cost) AS cost, max(s.isexact) AS isexact
       |       FROM sm0 s JOIN kq k ON k.slot = s.slot GROUP BY 1, 2),
       |wr AS (SELECT t.doc_id,
       |         coalesce((SELECT min(k.kpos) FROM kq k WHERE NOT EXISTS
       |           (SELECT 1 FROM sm WHERE sm.doc_id = t.doc_id AND sm.kpos = k.kpos)), $n) AS words_rank
       |       FROM (SELECT DISTINCT doc_id FROM sm) t),
       |base AS (SELECT w.doc_id, w.words_rank,
       |    (SELECT coalesce(sum(s.cost),0) FROM sm s WHERE s.doc_id=w.doc_id AND s.kpos < w.words_rank) AS typo_cost,
       |    (SELECT coalesce(sum(s.isexact),0) FROM sm s WHERE s.doc_id=w.doc_id AND s.kpos < w.words_rank) AS exact_words
       |  FROM wr w WHERE w.words_rank >= $minWr),
       |pp AS (SELECT DISTINCT tok.doc_id, d.slot, tok.pos FROM tok JOIN deriv d USING(term)$exactPred$ppPhrase),
       |pairs AS (SELECT a.doc_id, a.slot AS s1,
       |    least(min(${
         if (proxByAttribute)
           "CASE WHEN a.pos // 65536 = b.pos // 65536 THEN 1 ELSE 8 END"
         else
           "CASE WHEN b.pos > a.pos THEN b.pos - a.pos ELSE a.pos - b.pos + 1 END"
       }), 8) AS prox
       |  FROM pp a JOIN pp b ON a.doc_id=b.doc_id AND b.slot = a.slot + 1 GROUP BY 1,2),
       |prox AS (SELECT b.doc_id,
       |    coalesce((SELECT sum(p.prox) FROM pairs p
       |      JOIN kq k1 ON k1.slot = p.s1 JOIN kq k2 ON k2.slot = p.s1 + 1
       |      WHERE p.doc_id = b.doc_id AND k1.kpos < b.words_rank AND k2.kpos < b.words_rank), 0) AS prox_cost
       |  FROM base b),
       |mp AS (SELECT doc_id, slot, min(pos) AS minpos, min(pos % 65536) AS minrel$minwSel
       |  FROM pp GROUP BY 1, 2),
       |mpb AS (SELECT doc_id, slot, minpos$minwPass,
       |    CASE WHEN minrel<16 THEN minrel WHEN minrel<24 THEN 16+(minrel-16)//2
       |         WHEN minrel<64 THEN 20+(minrel-24)//8 WHEN minrel<256 THEN 25+(minrel-64)//32
       |         WHEN minrel<1024 THEN 31+(minrel-256)//128
       |         ELSE least(47, 37+(minrel-1024)//1024) END AS pb FROM mp),
       |posc AS (SELECT b.doc_id,
       |    (SELECT coalesce(sum(m.pb),0) FROM mpb m JOIN kq k ON k.slot = m.slot
       |      WHERE m.doc_id = b.doc_id AND k.kpos < b.words_rank) AS pos_cost,
       |    $fidSel
       |    (SELECT min(m.minpos) FROM mpb m WHERE m.doc_id=b.doc_id AND m.slot=0) AS first_pos
       |  FROM base b),
       |fin AS (SELECT b.doc_id, b.words_rank, b.typo_cost, x.prox_cost, p.pos_cost, p.fid_cost, b.exact_words,
       |    CASE WHEN b.words_rank=$n AND b.exact_words=$n AND p.first_pos=0 AND x.prox_cost<=${n - 1}
       |         THEN (CASE WHEN dl.len=$n THEN 3 ELSE 2 END) ELSE 1 END AS exact_attr
       |  FROM base b JOIN prox x USING(doc_id) JOIN posc p USING(doc_id) JOIN dl ON dl.doc_id=b.doc_id),
       |meili AS (SELECT doc_id, CAST(words_rank AS BIGINT) AS words_rank,
       |  CAST(typo_cost AS BIGINT) AS typo_cost, CAST(prox_cost AS BIGINT) AS prox_cost,
       |  CAST(fid_cost AS BIGINT) AS fid_cost,
       |  CAST(pos_cost AS BIGINT) AS pos_cost, CAST(exact_attr AS BIGINT) AS exact_attr,
       |  CAST(exact_words AS BIGINT) AS exact_words,
       |  CAST(((((((words_rank - 1) * ${maxTypo + 1} + ${maxTypo + 1} - typo_cost - 1) * ${maxProx + 1}
       |    + ${maxProx + 1} - prox_cost - 1) * ${maxFid + 1} + ${maxFid + 1} - least(fid_cost, $maxFid) - 1) * ${maxPos + 1}
       |    + ${maxPos + 1} - least(pos_cost, $maxPos) - 1) * 3
       |    + exact_attr - 1) * ${n + 1} + exact_words + 1 AS DOUBLE) / $maxM AS ranking_score
       |FROM fin)""".stripMargin
  }

  /** Final SELECT over the `meili` CTE: the cascade's lexicographic
    * order with optional user-sort keys between attribute and exactness
    * (the "sort" rule slot), an optional threshold/strategy WHERE, and
    * optional extra output columns. */
  private def meiliOracleSql(words: Seq[String], k: Int,
                             strategy: String = "last",
                             synonyms: Map[String, Seq[Seq[String]]] = Map.empty,
                             splits: Map[Int, Seq[String]] = Map.empty,
                             tokCte: String = TOK,
                             fidWeightSql: Option[String] = None,
                             maxFid: Int = 0,
                             sortJoin: String = "",
                             sortKeys: Seq[String] = Nil,
                             extraCols: String = "",
                             fidCol: Boolean = false,
                             where: String = "",
                             prefixLast: Boolean = false,
                             proxByAttribute: Boolean = false,
                             exactFids: Set[Int] = Set.empty): String = {
    val sortMid = if (sortKeys.isEmpty) "" else sortKeys.mkString("", ", ", ", ")
    val fidOut = if (fidCol) "m.fid_cost, " else ""
    s"""${meiliCtes(words, strategy, synonyms, splits, tokCte, fidWeightSql, maxFid, prefixLast, proxByAttribute, exactFids)}
       |SELECT m.doc_id, m.words_rank, m.typo_cost, m.prox_cost, ${fidOut}m.pos_cost,
       |  m.exact_attr, m.exact_words, m.ranking_score$extraCols
       |FROM meili m $sortJoin
       |$where
       |ORDER BY m.words_rank DESC, m.typo_cost ASC, m.prox_cost ASC, m.fid_cost ASC, m.pos_cost ASC,
       |  ${sortMid}m.exact_attr DESC, m.exact_words DESC, m.doc_id ASC LIMIT $k""".stripMargin
  }

  // ---------------------------------------------------------------------
  // DuckDB oracles. Shared prefix: tokenization with positions.
  // ---------------------------------------------------------------------
  private val TOK =
    """WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '') AS ts FROM documents),
      |tok AS (SELECT doc_id, unnest(ts) AS term, unnest(range(len(ts))) AS pos FROM tl),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dl AS (SELECT doc_id, len(ts) AS len FROM tl),
      |st AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT avg(len) FROM dl) AS avgdl),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)""".stripMargin

  /** Stop-word-index tokenization (q_stopword): the first 300 docs with
    * stop terms ('the', 'a') removed from the searchable token stream —
    * but positions of the surviving tokens and the doc length keep their
    * full-tokenization values (IndexBuild: tokenize, then filter; `len`
    * counts all tokens). */
  private val StopTok =
    """WITH dsub AS (SELECT * FROM documents WHERE doc_id < 300),
      |tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '') AS ts FROM dsub),
      |tokall AS (SELECT doc_id, unnest(ts) AS term, unnest(range(len(ts))) AS pos FROM tl),
      |tok AS (SELECT * FROM tokall WHERE term NOT IN ('the', 'a')),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dl AS (SELECT doc_id, len(ts) AS len FROM tl),
      |st AS (SELECT (SELECT count(*) FROM dsub) AS n, (SELECT avg(len) FROM dl) AS avgdl),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)""".stripMargin

  /** Two-field tokenization (q_multifield): positions carry the fid in
    * the high 16 bits (fid*65536 + relative pos, IndexBuild
    * .buildMultiField); doc len = total tokens across fields. Title
    * mirrors the q_multifield synthetic field exactly. */
  private val MfTok =
    """WITH flds AS (SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 0 THEN 'spark boost' ELSE lang END AS title,
      |  text AS body FROM documents),
      |tl AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(title),'[^a-z0-9]+'), x -> x <> '') AS ts0,
      |  list_filter(string_split_regex(lower(body),'[^a-z0-9]+'), x -> x <> '') AS ts1 FROM flds),
      |tok AS (SELECT doc_id, unnest(ts0) AS term, unnest(range(len(ts0))) AS pos FROM tl
      |  UNION ALL SELECT doc_id, unnest(ts1), 65536 + unnest(range(len(ts1))) FROM tl),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dl AS (SELECT doc_id, len(ts0) + len(ts1) AS len FROM tl),
      |st AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT avg(len) FROM dl) AS avgdl),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)""".stripMargin

  /** Synthetic geo fields + haversine distance to (40.7, -74.0) —
    * mirrors `geoDocs` and `Geo.haversineMeters` exactly. */
  private val GeoCtes =
    """WITH g AS (SELECT doc_id,
      |  (doc_id * 37 % 1601) / 10.0 - 80.0 AS lat,
      |  (doc_id * 73 % 3401) / 10.0 - 170.0 AS lng FROM documents),
      |gd AS (SELECT doc_id, lat, lng,
      |  2 * 6371000.0 * asin(least(1.0, sqrt(
      |    pow(sin((radians(40.7) - radians(lat)) / 2), 2) +
      |    cos(radians(lat)) * cos(radians(40.7)) *
      |    pow(sin((radians(-74.0) - radians(lng)) / 2), 2)))) AS dist
      | FROM g)""".stripMargin

  /** BM25 per-(doc,term) score for terms of one query. */
  private def bmCte(terms: Seq[String]): String = {
    val in = terms.map(t => s"'$t'").mkString(", ")
    s"""bm AS (SELECT tf.doc_id, tf.term,
       |  ln(1 + (st.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * 2.2 /
       |  (tf.tf + 1.2 * (0.25 + 0.75 * dl.len / st.avgdl)) AS ts
       | FROM tf JOIN dft USING(term) JOIN dl USING(doc_id) CROSS JOIN st
       | WHERE tf.term IN ($in))""".stripMargin
  }

  private def bm25Sql(terms: Seq[String], conjunctive: Boolean, k: Int,
                      filterJoin: String = ""): String = {
    val having = if (conjunctive) s"HAVING count(*) = ${terms.distinct.size}" else ""
    s"""$TOK,
       |${bmCte(terms)},
       |agg AS (SELECT doc_id, sum(ts) AS s FROM bm GROUP BY doc_id $having)
       |SELECT agg.doc_id AS doc_id, round(agg.s, 6) AS score
       |FROM agg $filterJoin
       |ORDER BY round(agg.s, 6) DESC, agg.doc_id ASC LIMIT $k""".stripMargin
  }

  private val ShingleCte =
    """sh AS (SELECT DISTINCT doc_id AS id, ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] AS shingle
      | FROM tl, unnest(range(len(ts) - 2)) AS u(i) WHERE len(ts) >= 3)""".stripMargin

  /** Per-sub-index BM25 CTEs for the federation oracle: each index has
    * its OWN N / avgdl / df statistics (they are independent indexes,
    * exactly as Federation fans out). Emits tl_/tf_/dl_/st_/dft_/agg_
    * CTEs suffixed by `alias`; agg_ is the conjunctive summed score. */
  private def fedBm(alias: String, pred: String, terms: Seq[String]): String = {
    val in = terms.map(t => s"'$t'").mkString(", ")
    s"""tl_$alias AS (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '') AS ts FROM documents WHERE $pred),
       |tf_$alias AS (SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, unnest(ts) AS term FROM tl_$alias) GROUP BY 1, 2),
       |dl_$alias AS (SELECT doc_id, len(ts) AS len FROM tl_$alias),
       |st_$alias AS (SELECT (SELECT count(*) FROM tl_$alias) AS n, (SELECT avg(len) FROM dl_$alias) AS avgdl),
       |dft_$alias AS (SELECT term, count(*) AS df FROM tf_$alias GROUP BY 1),
       |agg_$alias AS (SELECT tf.doc_id,
       |  sum(ln(1 + (st.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * 2.2 /
       |      (tf.tf + 1.2 * (0.25 + 0.75 * dl.len / st.avgdl))) AS s
       | FROM tf_$alias tf JOIN dft_$alias dft USING(term) JOIN dl_$alias dl USING(doc_id) CROSS JOIN st_$alias st
       | WHERE tf.term IN ($in) GROUP BY tf.doc_id HAVING count(*) = ${terms.distinct.size})""".stripMargin
  }

  /** Kirsch-Mitzenmacher minhash base: two 40-bit halves of one md5
    * per shingle — mirrors `Dedup.minhashSignatures`. */
  private val MinHashCte =
    """mh AS (SELECT id,
      | ('0x' || substr(md5(shingle), 1, 10))::BIGINT AS h1,
      | ('0x' || substr(md5(shingle), 11, 10))::BIGINT AS h2 FROM sh)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_dict" ->
      s"""$TOK SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
         |FROM tf GROUP BY term ORDER BY term""".stripMargin,
    "q_doclen" ->
      s"""$TOK SELECT doc_id, len FROM dl ORDER BY doc_id""".stripMargin,
    "q_stats" ->
      s"""$TOK SELECT st.n AS n_docs, round(st.avgdl, 6) AS avgdl FROM st""".stripMargin,
    "q_bm25_and" -> bm25Sql(Seq("spark", "merge"), conjunctive = true, 20),
    "q_bm25_or" -> bm25Sql(Seq("batch", "stream", "window"), conjunctive = false, 20),
    "q_bm25_filter" -> bm25Sql(Seq("data", "table"), conjunctive = true, 20,
      "JOIN documents d ON d.doc_id = agg.doc_id AND d.lang = 'en'"),
    "q_facet_lang" ->
      s"""$TOK, cand AS (SELECT doc_id FROM tf WHERE term = 'batch')
         |SELECT d.lang AS lang, count(*) AS n FROM documents d
         |JOIN cand USING(doc_id) GROUP BY d.lang
         |ORDER BY n DESC, lang ASC LIMIT 100""".stripMargin,
    "q_facet_alpha" ->
      s"""$TOK, cand AS (SELECT doc_id FROM tf WHERE term = 'batch')
         |SELECT d.lang AS lang, count(*) AS n FROM documents d
         |JOIN cand USING(doc_id) GROUP BY d.lang
         |ORDER BY lang ASC LIMIT 3""".stripMargin,
    "q_facet_stats" ->
      s"""$TOK, cand AS (SELECT doc_id FROM tf WHERE term = 'batch')
         |SELECT min(length(d.text)) AS min_nchars, max(length(d.text)) AS max_nchars,
         |count(*) AS n FROM documents d JOIN cand USING(doc_id)""".stripMargin,
    "q_facet_range" ->
      s"""$TOK SELECT len AS value, count(*) AS n FROM dl
         |WHERE len BETWEEN 40 AND 80 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sort" ->
      s"""$TOK, cand AS (SELECT doc_id FROM tf WHERE term = 'window')
         |SELECT d.doc_id AS doc_id, length(d.text) AS n_chars_m FROM documents d
         |JOIN cand USING(doc_id)
         |ORDER BY n_chars_m DESC, doc_id ASC LIMIT 30""".stripMargin,
    "q_distinct" ->
      s"""$TOK,
         |${bmCte(Seq("spark"))},
         |agg AS (SELECT doc_id, round(sum(ts), 6) AS score FROM bm GROUP BY doc_id),
         |ranked AS (SELECT d.source AS source, agg.doc_id AS doc_id, agg.score AS score,
         |  row_number() OVER (PARTITION BY d.source ORDER BY agg.score DESC, agg.doc_id ASC) AS rn
         | FROM agg JOIN documents d USING(doc_id))
         |SELECT source, doc_id, score FROM ranked WHERE rn = 1 ORDER BY source""".stripMargin,
    "q_words_count" ->
      s"""$TOK SELECT doc_id, count(DISTINCT term) AS n_matched FROM tf
         |WHERE term IN ('batch', 'stream', 'window') GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_phrase" ->
      s"""$TOK SELECT DISTINCT a.doc_id AS doc_id
         |FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |WHERE a.term = 'batch' AND b.term = 'batch' ORDER BY doc_id""".stripMargin,
    "q_proximity" ->
      s"""$TOK SELECT a.doc_id AS doc_id,
         |least(min(CASE WHEN b.pos > a.pos THEN b.pos - a.pos ELSE a.pos - b.pos + 1 END), 7) AS prox
         |FROM tok a JOIN tok b ON a.doc_id = b.doc_id
         |WHERE a.term = 'spark' AND b.term = 'merge' GROUP BY a.doc_id ORDER BY doc_id""".stripMargin,
    "q_negative" ->
      s"""$TOK SELECT DISTINCT doc_id FROM tf WHERE term = 'batch'
         |AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'stream') ORDER BY doc_id""".stripMargin,
    "q_prefix" ->
      s"""$TOK SELECT doc_id, count(DISTINCT term) AS n_terms FROM tf
         |WHERE term LIKE 's%' GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_typo" ->
      s"""$TOK SELECT doc_id, count(DISTINCT term) AS n_terms FROM tf
         |WHERE levenshtein(term, 'sparkz') <= 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keeper
        |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin,
    "q_jaccard" ->
      s"""$TOK,
         |$ShingleCte,
         |shh AS (SELECT id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle FROM sh),
         |sz AS (SELECT id, count(*) AS s FROM shh GROUP BY id),
         |pairs AS (SELECT a.id AS a, b.id AS b, count(*) AS inter
         | FROM shh a JOIN shh b ON a.shingle = b.shingle AND a.id < b.id
         | GROUP BY a.id, b.id)
         |SELECT p.a AS a, p.b AS b, p.inter AS inter,
         | (sa.s + sb.s - p.inter) AS uni,
         | round(p.inter / (sa.s + sb.s - p.inter), 6) AS jacc
         |FROM pairs p JOIN sz sa ON sa.id = p.a JOIN sz sb ON sb.id = p.b
         |WHERE round(p.inter / (sa.s + sb.s - p.inter), 6) >= 0.2 ORDER BY a, b""".stripMargin,
    "q_minhash" ->
      s"""$TOK,
         |$ShingleCte,
         |$MinHashCte
         |SELECT id, min(h1 + 0*h2) AS mh0, min(h1 + 1*h2) AS mh1,
         | min(h1 + 2*h2) AS mh2, min(h1 + 3*h2) AS mh3
         |FROM mh GROUP BY id ORDER BY id""".stripMargin,
    "q_lsh_pairs" ->
      s"""$TOK,
         |$ShingleCte,
         |$MinHashCte,
         |sig AS (SELECT id, min(h1 + 0*h2) AS mh0, min(h1 + 1*h2) AS mh1,
         |  min(h1 + 2*h2) AS mh2, min(h1 + 3*h2) AS mh3,
         |  min(h1 + 4*h2) AS mh4, min(h1 + 5*h2) AS mh5,
         |  min(h1 + 6*h2) AS mh6, min(h1 + 7*h2) AS mh7
         | FROM mh GROUP BY id),
         |buckets AS (
         | SELECT id, 0 AS band, md5(mh0::VARCHAR || '|' || mh1::VARCHAR) AS bh FROM sig UNION ALL
         | SELECT id, 1, md5(mh2::VARCHAR || '|' || mh3::VARCHAR) FROM sig UNION ALL
         | SELECT id, 2, md5(mh4::VARCHAR || '|' || mh5::VARCHAR) FROM sig UNION ALL
         | SELECT id, 3, md5(mh6::VARCHAR || '|' || mh7::VARCHAR) FROM sig)
         |SELECT DISTINCT l.id AS a, r.id AS b FROM buckets l
         |JOIN buckets r ON l.band = r.band AND l.bh = r.bh AND l.id < r.id ORDER BY a, b""".stripMargin,
    "q_simhash" ->
      s"""$TOK,
         |th AS (SELECT doc_id, term, tf, md5(term) AS h FROM tf),
         |bits AS (SELECT doc_id, j,
         |  sum(CASE WHEN substr(h, j + 1, 1) IN ('8','9','a','b','c','d','e','f')
         |      THEN tf ELSE -tf END) AS s
         | FROM th, unnest(range(16)) AS u(j) GROUP BY doc_id, j)
         |SELECT doc_id AS id, CAST(sum(CASE WHEN s >= 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY id""".stripMargin,
    "q_simhash64" ->
      s"""$TOK,
         |th AS (SELECT doc_id, term, tf,
         |  ('0x' || substr(md5(term), 1, 8))::BIGINT AS h1,
         |  ('0x' || substr(md5(term), 9, 8))::BIGINT AS h2 FROM tf),
         |bits AS (SELECT doc_id, j,
         |  sum(CASE WHEN ((CASE WHEN j < 32 THEN h1 ELSE h2 END) >> (j % 32)) & 1 = 1
         |      THEN tf ELSE -tf END) AS s
         | FROM th, unnest(range(64)) AS u(j) GROUP BY doc_id, j)
         |SELECT doc_id AS id,
         |  -- bit 63 is the two's-complement sign bit: duckdb refuses
         |  -- 1<<63, so it enters the sum as -2^63 (same i64 encoding)
         |  CAST(sum(CASE WHEN s >= 0 AND j = 63 THEN -9223372036854775807 - 1
         |           WHEN s >= 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
         |           ELSE 0 END) AS BIGINT) AS simhash64
         |FROM bits GROUP BY doc_id ORDER BY id""".stripMargin,
    "q_quality" ->
      s"""$TOK,
         |agg AS (SELECT doc_id,
         |  sum(length(term)) AS sumlen,
         |  sum(CASE WHEN term IN ('the','a','an','and','of','to','in','is','it','on','for','with') THEN 1 ELSE 0 END) AS nstop,
         |  count(DISTINCT term) AS ndist, count(*) AS ntok
         | FROM tok GROUP BY doc_id)
         |SELECT d.doc_id AS id, length(d.text) AS n_chars_m, a.ntok AS n_tokens,
         | a.ndist AS n_distinct,
         | round(a.sumlen / greatest(a.ntok, 1), 6) AS avg_token_len,
         | round(a.nstop / greatest(a.ntok, 1), 6) AS stopword_ratio,
         | round(a.ndist / greatest(a.ntok, 1), 6) AS distinct_ratio
         |FROM documents d JOIN agg a USING(doc_id) ORDER BY id""".stripMargin,
    "q_langid" ->
      s"""$TOK,
         |sc AS (SELECT doc_id,
         |  sum(CASE WHEN term IN ('the','and','of','to','a','is') THEN 1 ELSE 0 END) AS s_en,
         |  sum(CASE WHEN term IN ('el','la','los','de','y','que') THEN 1 ELSE 0 END) AS s_es,
         |  sum(CASE WHEN term IN ('le','la','les','et','de','un') THEN 1 ELSE 0 END) AS s_fr,
         |  sum(CASE WHEN term IN ('der','die','das','und','zu','ist') THEN 1 ELSE 0 END) AS s_de
         | FROM tok GROUP BY doc_id)
         |SELECT doc_id AS id,
         | CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
         |      WHEN s_es > 0 AND s_es >= s_fr AND s_es >= s_de THEN 'es'
         |      WHEN s_fr > 0 AND s_fr >= s_de THEN 'fr'
         |      WHEN s_de > 0 THEN 'de'
         |      ELSE 'und' END AS lang_pred
         |FROM sc ORDER BY id""".stripMargin,
    "q_fingerprint" ->
      s"""$TOK
         |SELECT doc_id AS id,
         | md5(array_to_string(list_sort(list_distinct(ts)), ' ')) AS fp,
         | len(list_distinct(ts)) AS n_distinct
         |FROM tl ORDER BY id""".stripMargin,
    "q_knn" ->
      """WITH ex AS (SELECT vec_id, unnest(embedding) AS x, unnest(range(len(embedding))) AS i FROM embeddings),
        |q AS (SELECT i, CAST(x AS DOUBLE) AS qx FROM ex WHERE vec_id = 0),
        |dots AS (SELECT e.vec_id,
        |  sum(CAST(floor(CAST(e.x AS DOUBLE) * q.qx * 1e9 + 0.5) AS BIGINT)) AS dot,
        |  sum(CAST(floor(CAST(e.x AS DOUBLE) * CAST(e.x AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS nn
        | FROM ex e JOIN q ON e.i = q.i GROUP BY e.vec_id),
        |qn AS (SELECT nn AS qnorm FROM dots WHERE vec_id = 0)
        |SELECT d.vec_id AS vec_id,
        | round(d.dot / sqrt(CAST(d.nn * qn.qnorm AS DOUBLE)), 6) AS score
        |FROM dots d CROSS JOIN qn
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    // ANN multi-probe oracle: the hyperplanes are deterministic
    // splitmix64-derived algorithm parameters (like the seed), inlined
    // below as SQL literals; bucket bit p = sign of the FIXED-POINT
    // plane dot (1e-9 BIGINT units — order-independent, so Spark and
    // DuckDB agree bit-for-bit); probes = buckets within Hamming
    // distance 2 of the query's bucket; exact fixed-point cosine
    // re-rank within the probed rows (Similarity.lshIndexTopK)
    "q_knn_lsh" ->
      s"""WITH planes(p, i, w) AS (VALUES ${lshPlaneValues(4, 64, 42L)}),
         |ex AS (SELECT vec_id, unnest(embedding) AS x, unnest(range(len(embedding))) AS i FROM embeddings),
         |exd AS (SELECT vec_id, CAST(x AS DOUBLE) AS x, i FROM ex),
         |pd AS (SELECT e.vec_id, pl.p,
         |  sum(CAST(floor(e.x * pl.w * 1e9 + 0.5) AS BIGINT)) AS pdot
         | FROM exd e JOIN planes pl ON e.i = pl.i GROUP BY 1, 2),
         |bk AS (SELECT vec_id,
         |  sum(CASE WHEN pdot >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS bucket
         | FROM pd GROUP BY 1),
         |qb AS (SELECT bucket AS qbucket FROM bk WHERE vec_id = 0),
         |probed AS (SELECT b.vec_id FROM bk b CROSS JOIN qb
         | WHERE bit_count(xor(b.bucket, qb.qbucket)) <= 2),
         |nrm AS (SELECT vec_id, sum(CAST(floor(x * x * 1e9 + 0.5) AS BIGINT)) AS nn
         | FROM exd GROUP BY 1),
         |qv AS (SELECT i, x AS qx FROM exd WHERE vec_id = 0),
         |dots AS (SELECT e.vec_id, sum(CAST(floor(e.x * q.qx * 1e9 + 0.5) AS BIGINT)) AS dot
         | FROM exd e JOIN qv q ON e.i = q.i
         | JOIN probed pr ON pr.vec_id = e.vec_id GROUP BY 1),
         |qn AS (SELECT nn AS qnorm FROM nrm WHERE vec_id = 0)
         |SELECT d.vec_id AS vec_id,
         | round(d.dot / sqrt(CAST(n.nn AS DOUBLE) * CAST(qn.qnorm AS DOUBLE)), 6) AS score
         |FROM dots d JOIN nrm n ON n.vec_id = d.vec_id CROSS JOIN qn
         |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q_neardup" ->
      """WITH ex AS (SELECT vec_id, unnest(embedding) AS x, unnest(range(len(embedding))) AS i FROM embeddings),
        |exd AS (SELECT vec_id, CAST(x AS DOUBLE) AS x, i FROM ex),
        |nrm AS (SELECT vec_id, sum(CAST(floor(x * x * 1e9 + 0.5) AS BIGINT)) AS nn FROM exd GROUP BY 1),
        |dots AS (SELECT a.vec_id AS a, b.vec_id AS b,
        |  sum(CAST(floor(a.x * b.x * 1e9 + 0.5) AS BIGINT)) AS dot
        | FROM exd a JOIN exd b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2)
        |SELECT d.a, d.b, round(d.dot / sqrt(CAST(na.nn * nb.nn AS DOUBLE)), 6) AS cos
        |FROM dots d JOIN nrm na ON na.vec_id = d.a JOIN nrm nb ON nb.vec_id = d.b
        |WHERE na.nn > 0 AND nb.nn > 0
        |AND round(d.dot / sqrt(CAST(na.nn * nb.nn AS DOUBLE)), 6) >= 0.4
        |ORDER BY a, b""".stripMargin,
    "q_tokens" ->
      """SELECT doc_id AS id,
        |len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS n_bpe_est,
        |CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_char_est
        |FROM documents ORDER BY id""".stripMargin,
    "q_hybrid" ->
      s"""${meiliCtes(Seq("spark", "merge"))},
         |ex AS (SELECT vec_id, unnest(embedding) AS x, unnest(range(len(embedding))) AS i FROM embeddings),
         |qv AS (SELECT i, CAST(x AS DOUBLE) AS qx FROM ex WHERE vec_id = 0),
         |dots AS (SELECT e.vec_id,
         |  sum(CAST(floor(CAST(e.x AS DOUBLE) * qv.qx * 1e9 + 0.5) AS BIGINT)) AS dot,
         |  sum(CAST(floor(CAST(e.x AS DOUBLE) * CAST(e.x AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS nn
         | FROM ex e JOIN qv ON e.i = qv.i GROUP BY e.vec_id),
         |qn AS (SELECT nn AS qnorm FROM dots WHERE vec_id = 0),
         |sem AS (SELECT d.vec_id AS doc_id,
         |  round(d.dot / sqrt(CAST(d.nn * qn.qnorm AS DOUBLE)), 6) AS sem0
         | FROM dots d CROSS JOIN qn)
         |SELECT COALESCE(m.doc_id, s.doc_id) AS doc_id,
         | round(greatest(coalesce(m.ranking_score * 0.5, 0), coalesce(s.sem0 * 0.5, 0)), 6) AS hybrid_score,
         | round(coalesce(m.ranking_score, 0), 6) AS kw_score,
         | round(coalesce(s.sem0, 0), 6) AS sem_score
         |FROM meili m FULL OUTER JOIN sem s ON m.doc_id = s.doc_id
         |ORDER BY hybrid_score DESC, doc_id ASC LIMIT 20""".stripMargin,
    "q_hybrid_vec" ->
      s"""${meiliCtes(Seq("spark", "merge"))},
         |ex AS (SELECT vec_id, unnest(embedding) AS x, unnest(range(len(embedding))) AS i FROM embeddings),
         |qv AS (SELECT i, qx FROM (VALUES $extQueryVecSql) AS t(i, qx)),
         |qn AS (SELECT sum(CAST(floor(qx * qx * 1e9 + 0.5) AS BIGINT)) AS qnorm FROM qv),
         |dots AS (SELECT e.vec_id,
         |  sum(CAST(floor(CAST(e.x AS DOUBLE) * qv.qx * 1e9 + 0.5) AS BIGINT)) AS dot,
         |  sum(CAST(floor(CAST(e.x AS DOUBLE) * CAST(e.x AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS nn
         | FROM ex e JOIN qv ON e.i = qv.i GROUP BY e.vec_id),
         |sem AS (SELECT d.vec_id AS doc_id,
         |  round(d.dot / sqrt(CAST(d.nn AS DOUBLE) * CAST(qn.qnorm AS DOUBLE)), 6) AS sem0
         | FROM dots d CROSS JOIN qn)
         |SELECT COALESCE(m.doc_id, s.doc_id) AS doc_id,
         | round(greatest(coalesce(m.ranking_score * 0.5, 0), coalesce(s.sem0 * 0.5, 0)), 6) AS hybrid_score,
         | round(coalesce(m.ranking_score, 0), 6) AS kw_score,
         | round(coalesce(s.sem0, 0), 6) AS sem_score
         |FROM meili m FULL OUTER JOIN sem s ON m.doc_id = s.doc_id
         |ORDER BY hybrid_score DESC, doc_id ASC LIMIT 20""".stripMargin,
    "q_similar" ->
      """WITH ex AS (SELECT vec_id, unnest(embedding) AS x, unnest(range(len(embedding))) AS i FROM embeddings),
        |qv AS (SELECT i, CAST(x AS DOUBLE) AS qx FROM ex WHERE vec_id = 3),
        |dots AS (SELECT e.vec_id,
        |  sum(CAST(floor(CAST(e.x AS DOUBLE) * qv.qx * 1e9 + 0.5) AS BIGINT)) AS dot,
        |  sum(CAST(floor(CAST(e.x AS DOUBLE) * CAST(e.x AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS nn
        | FROM ex e JOIN qv ON e.i = qv.i GROUP BY e.vec_id),
        |qn AS (SELECT nn AS qnorm FROM dots WHERE vec_id = 3)
        |SELECT d.vec_id AS doc_id,
        | round(d.dot / sqrt(CAST(d.nn AS DOUBLE) * CAST(qn.qnorm AS DOUBLE)), 6) AS score
        |FROM dots d CROSS JOIN qn
        |JOIN documents doc ON doc.doc_id = d.vec_id AND doc.lang = 'en'
        |WHERE d.vec_id <> 3
        |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "q_meili_rank" -> meiliOracleSql(Seq("spark", "merge", "batch"), 50),
    "q_score_details" -> meiliOracleSql(Seq("spark", "merge"), 50,
      extraCols = ", m.ranking_score AS details_score"),
    "q_meili_typo" -> meiliOracleSql(Seq("spork", "merge"), 50),
    "q_meili_ngram" -> meiliOracleSql(Seq("win", "dow"), 50),
    "q_tms_all" -> meiliOracleSql(Seq("spark", "merge", "batch"), 50, strategy = "all"),
    "q_tms_freq" -> meiliOracleSql(Seq("spark", "window", "merge"), 50, strategy = "frequency"),
    "q_threshold" -> meiliOracleSql(Seq("spark", "merge"), 50,
      where = "WHERE m.ranking_score >= 0.5"),
    "q_sort_rule" -> meiliOracleSql(Seq("spark", "merge"), 50,
      sortJoin = "JOIN documents d ON d.doc_id = m.doc_id",
      sortKeys = Seq("d.lang ASC NULLS LAST"),
      extraCols = ", d.lang AS lang"),
    "q_synonym" -> meiliOracleSql(Seq("lookup", "ts"), 50,
      synonyms = Map("lookup" -> Seq(Seq("query")), "ts" -> Seq(Seq("table", "scan")))),
    "q_split" -> meiliOracleSql(Seq("sparkmerge", "batch"), 50,
      // 'sparkmerge' has exactly one in-vocabulary split (spark|merge),
      // so the engine's frequency-based splitBest choice is static here.
      // INVARIANT this static oracle leans on: the engine only adds the
      // split when the slot has NO other derivations (MeiliRank:
      // `if (derivs.isEmpty) splitBest`), and no corpus vocabulary term
      // is within effective typo distance 2 of 'sparkmerge' (longest
      // vocab word is 8 chars) — if the generator's vocabulary ever
      // grows such a term, this oracle and the engine would diverge
      splits = Map(0 -> Seq("spark", "merge"))),
    "q_meili_prefix" -> meiliOracleSql(Seq("spark", "win"), 50, prefixLast = true),
    "q_stopword" -> meiliOracleSql(Seq("spark", "merge"), 50, tokCte = StopTok),
    // independent re-derivation of the dictionary segmentation: a
    // recursive CTE segments each distinct synthetic Thai doc by
    // longest dictionary match (nothing shared with the Scala
    // greedy-match loop), then df/cf aggregate over the 400-doc corpus
    "q_thai_dict" ->
      """WITH RECURSIVE
        |docs AS (SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'แมวกินปลา' WHEN 1 THEN 'ปลาทองนอน'
        |    WHEN 2 THEN 'สวัสดีครับ' ELSE 'กินปลาปลาทอง' END AS text
        |  FROM documents WHERE doc_id < 400),
        |dict(w) AS (VALUES ('แมว'),('กิน'),('ปลา'),('ปลาทอง'),('นอน'),('สวัสดี'),('ครับ')),
        |texts AS (SELECT DISTINCT text FROM docs),
        |seg AS (
        |  SELECT text, text AS rest, CAST(NULL AS VARCHAR) AS term FROM texts
        |  UNION ALL
        |  SELECT s.text, substr(s.rest, length(d.w) + 1), d.w
        |  FROM seg s JOIN dict d ON starts_with(s.rest, d.w)
        |  WHERE length(d.w) = (SELECT max(length(d2.w)) FROM dict d2
        |                       WHERE starts_with(s.rest, d2.w))),
        |toks AS (SELECT text, term FROM seg WHERE term IS NOT NULL),
        |tf AS (SELECT d.doc_id, t.term, count(*) AS tf
        |       FROM docs d JOIN toks t USING (text) GROUP BY 1, 2)
        |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
        |FROM tf GROUP BY term ORDER BY term""".stripMargin,
    "q_multifield" -> meiliOracleSql(Seq("spark", "merge"), 50, tokCte = MfTok,
      fidWeightSql = Some("CASE WHEN pos // 65536 = 0 THEN 0 ELSE 1 END"),
      maxFid = 2, fidCol = true),
    "q_meili_prox_attr" -> meiliOracleSql(Seq("spark", "merge"), 50, tokCte = MfTok,
      fidWeightSql = Some("CASE WHEN pos // 65536 = 0 THEN 0 ELSE 1 END"),
      maxFid = 2, fidCol = true, proxByAttribute = true),
    "q_meili_exact_attr" -> meiliOracleSql(Seq("spork", "merge"), 50, tokCte = MfTok,
      fidWeightSql = Some("CASE WHEN pos // 65536 = 0 THEN 0 ELSE 1 END"),
      maxFid = 2, fidCol = true, exactFids = Set(0)),
    "q_field_dist" ->
      """WITH c AS (SELECT count(*) AS n FROM documents)
        |SELECT * FROM (
        |  SELECT 'commit' AS field, n AS n_docs FROM c UNION ALL
        |  SELECT 'content', n FROM c UNION ALL
        |  SELECT 'content_sha256', n FROM c UNION ALL
        |  SELECT 'lang', n FROM c UNION ALL
        |  SELECT 'len', n FROM c UNION ALL
        |  SELECT 'path', n FROM c UNION ALL
        |  SELECT 'repo', n FROM c)
        |ORDER BY field""".stripMargin,
    "q_total_hits" ->
      s"""$TOK SELECT count(DISTINCT tf.doc_id) AS total_hits
         |FROM tf JOIN documents d USING(doc_id)
         |WHERE tf.term IN ('batch', 'stream') AND d.lang = 'en'""".stripMargin,
    "q_total_hits_distinct" ->
      s"""${meiliCtes(Seq("batch", "stream"))}
         |SELECT CAST(count(DISTINCT d.source)
         |  + (CASE WHEN count(CASE WHEN d.source IS NULL THEN 1 END) > 0
         |     THEN 1 ELSE 0 END) AS BIGINT) AS total_hits
         |FROM meili m JOIN documents d ON d.doc_id = m.doc_id""".stripMargin,
    "q_federation" ->
      s"""WITH ${fedBm("a", "doc_id % 2 = 0", Seq("batch", "stream"))},
         |${fedBm("b", "doc_id % 2 = 1", Seq("batch", "stream"))}
         |SELECT * FROM (
         |  SELECT 'a' AS index_uid, doc_id, round(s * 1.0, 6) AS weighted_score FROM agg_a
         |  UNION ALL
         |  SELECT 'b', doc_id, round(s * 0.5, 6) FROM agg_b)
         |ORDER BY weighted_score DESC, index_uid ASC, doc_id ASC LIMIT 30""".stripMargin,
    // the dump-import roundtrip must reproduce the source index exactly,
    // so its oracle is the plain BM25 oracle over the original corpus
    "q_dump" -> bm25Sql(Seq("spark", "merge"), conjunctive = true, 20),
    "q_mixed" ->
      s"""$TOK,
         |${bmCte(Seq("batch", "spark", "merge"))},
         |ph AS (SELECT DISTINCT a.doc_id FROM tok a
         |  JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  WHERE a.term = 'spark' AND b.term = 'merge'),
         |agg AS (SELECT doc_id, sum(ts) AS s FROM bm GROUP BY doc_id HAVING count(*) = 3)
         |SELECT agg.doc_id AS doc_id, round(agg.s, 6) AS score
         |FROM agg JOIN ph USING(doc_id)
         |WHERE agg.doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'stream')
         |ORDER BY round(agg.s, 6) DESC, agg.doc_id ASC LIMIT 20""".stripMargin,
    "q_facet_search" ->
      s"""$TOK, cand AS (SELECT doc_id FROM tf WHERE term = 'batch'),
         |vals AS (SELECT d.source AS value, count(*) AS n FROM documents d
         |  JOIN cand USING(doc_id) GROUP BY d.source)
         |SELECT value, n FROM vals v
         |WHERE v.value LIKE 'srcc1%'
         |   -- prefix-accepting DFA: dist(prefix, q) >= |len(prefix)-len(q)|,
         |   -- so with budget 1 only prefix lengths 4..6 can accept
         |   OR levenshtein(substr(v.value, 1, 4), 'srcc1') <= 1
         |   OR levenshtein(substr(v.value, 1, 5), 'srcc1') <= 1
         |   OR levenshtein(substr(v.value, 1, 6), 'srcc1') <= 1
         |ORDER BY n DESC, value ASC LIMIT 100""".stripMargin,
    "q_geo_radius" ->
      s"""$GeoCtes
         |SELECT doc_id, CAST(round(dist, 0) AS BIGINT) AS dist_m FROM gd
         |WHERE dist <= 2500000 ORDER BY doc_id""".stripMargin,
    "q_geo_sort" ->
      s"""$GeoCtes
         |SELECT doc_id, CAST(round(dist, 0) AS BIGINT) AS dist_m FROM gd
         |WHERE lat BETWEEN 10 AND 60 AND lng BETWEEN -120 AND -20
         |ORDER BY CAST(round(dist, 0) AS BIGINT) ASC, doc_id ASC LIMIT 50""".stripMargin,
    "q_json" ->
      """SELECT doc_id, 'lang: ' || lang || '. source: ' || source ||
        |'. tags: ' || lang || '. ' || source || '. . ' AS flat
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_page" ->
      s"""$TOK,
         |${bmCte(Seq("batch", "stream"))},
         |agg AS (SELECT doc_id, sum(ts) AS s FROM bm GROUP BY doc_id)
         |SELECT doc_id, round(s, 6) AS score FROM agg
         |ORDER BY round(s, 6) DESC, doc_id ASC LIMIT 20 OFFSET 20""".stripMargin,
    "q_delete" ->
      // Lucene live-docs semantics: N/avgdl/df count ALL 200 docs (the
      // statistics base includes tombstones until compaction); only the
      // output rows exclude deleted ids
      """WITH d200 AS (SELECT * FROM documents WHERE doc_id < 200),
        |tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '') AS ts FROM d200),
        |tf AS (SELECT doc_id, unnest(ts) AS term FROM tl),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
        |dl AS (SELECT doc_id, len(ts) AS len FROM tl),
        |st AS (SELECT (SELECT count(*) FROM d200) AS n, (SELECT avg(len) FROM dl) AS avgdl),
        |dft AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
        |bm AS (SELECT tfc.doc_id, tfc.term,
        |  ln(1 + (st.n - dft.df + 0.5) / (dft.df + 0.5)) * tfc.tf * 2.2 /
        |  (tfc.tf + 1.2 * (0.25 + 0.75 * dl.len / st.avgdl)) AS ts
        | FROM tfc JOIN dft USING(term) JOIN dl USING(doc_id) CROSS JOIN st
        | WHERE tfc.term IN ('batch', 'stream')),
        |agg AS (SELECT doc_id, sum(ts) AS s FROM bm GROUP BY doc_id HAVING count(*) = 2)
        |SELECT doc_id, round(s, 6) AS score FROM agg
        |WHERE doc_id % 7 <> 0
        |ORDER BY round(s, 6) DESC, doc_id ASC LIMIT 20""".stripMargin,
    // degraded search: the docid-shard prefix (4 shards x 512 docs) with
    // UNCHANGED index-global statistics (idf/avgdl over the full corpus)
    "q_degraded" ->
      s"""$TOK,
         |${bmCte(Seq("batch", "stream"))},
         |agg AS (SELECT doc_id, sum(ts) AS s FROM bm GROUP BY doc_id HAVING count(*) = 2)
         |SELECT agg.doc_id AS doc_id, round(agg.s, 6) AS score,
         |  (SELECT count(*) FROM documents) > 2048 AS degraded
         |FROM agg WHERE agg.doc_id < 2048
         |ORDER BY round(agg.s, 6) DESC, agg.doc_id ASC LIMIT 20""".stripMargin,
    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |event_type, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q_mm_features" ->
      """SELECT doc_id AS asset_id,
        |CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |octet_length(CAST(text AS BLOB)) AS byte_len, sha256(text) AS sha
        |FROM documents ORDER BY asset_id""".stripMargin,
    // FakeDecoder frameCount = 1 + sha256_byte[2] % 32 (deterministic
    // stand-in) — the sampling plan itself is what this gates
    "q_mm_frames" ->
      """WITH v AS (SELECT doc_id,
        |  1 + (('0x' || substr(sha256(text), 5, 2))::BIGINT % 32) AS fc
        | FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id AS asset_id, unnest(range(0, fc, 4)) AS frame_idx
        |FROM v ORDER BY asset_id, frame_idx""".stripMargin
  )
}
