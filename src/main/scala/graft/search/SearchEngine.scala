package graft.search

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{BM25, Tokenizer, VByte}
import graft.index.IndexBuild

/** Per-term statistics resolved at query-analysis time. */
final case class QueryTerm(term: String, df: Long, idf: Double, bucket: Int)

/** Decoded posting row (query-time only; narrow from block decode). */
final case class Posting(docId: Int, term: String, tf: Int)

/** Top-k search result row. */
final case class Hit(docId: Int, score: Double)

/** The read side: BM25 top-k ranked retrieval over the index written by
  * [[graft.index.IndexBuild]] (Spark-first re-expression of the
  * reference's search path, crates/milli/src/search/new/mod.rs: universe
  * filter → term resolution → ranked retrieval → top-k).
  *
  * Two physical strategies, cross-checked in tests:
  *  - `searchDF`: fully declarative — posting scan (bucket-pruned, term
  *    filter pushed to parquet) → decode flatMap → broadcast-joined
  *    doclen/idf → groupBy(docId) → orderBy(score desc, docId).limit(k)
  *    (Catalyst plans TakeOrderedAndProject; no global sort).
  *  - `searchWand`: per-shard block-max WAND inside `mapGroups` (partial
  *    top-k per shard, exact global merge) — skips whole blocks via
  *    (firstDoc, lastDoc, blockMaxScore) without decoding them.
  *
  * Tie-break invariant: equal scores → ascending docId (reference
  * bucket_sort.rs:343-364).
  *
  * LIFETIME: an engine is a SNAPSHOT of the index at construction —
  * stats/dict/stop-words load eagerly, file listings and the prefix
  * dictionary cache lazily. After `IndexBuild.append`/`delete`/
  * `buildPrefixIndex` mutate the directory, construct a new engine
  * (the reference's RoTxn snapshot semantics; `api.Client.index`
  * already returns a fresh engine per call, so facade users get this
  * for free). A held instance keeps serving the pre-mutation view.
  *
  * INTERACTIVE DEPLOYMENT: warm query latency is Spark-job-dispatch
  * bound (2-3 jobs/query after the table-reader cache), not data
  * bound — the plans read only the query's pruned term buckets. For a
  * latency-sensitive service, run the query session with
  * `spark.sql.adaptive.enabled=false`: these plans are pruned scans +
  * broadcast joins with nothing for AQE to re-plan, and each AQE
  * exchange otherwise materializes as an extra driver round trip
  * (measured ~17% on warm p50, BENCH.md). Batch/build sessions should
  * keep AQE on.
  */
final class SearchEngine(val spark: SparkSession, val indexDir: String,
                         val broadcastDfCap: Long = SearchEngine.BroadcastDfCap)
    extends Serializable {
  import spark.implicits._

  // ---- loaded-once index metadata (the FST/dictionary analogue) -------
  val stats: Map[String, Double] =
    spark.read.parquet(s"$indexDir/stats").as[(String, Double)].collect().toMap
  val nDocs: Long = stats("N").toLong
  val avgdl: Double = stats("avgdl")
  // normalizer-fold version pinning: an index whose terms were folded
  // by a different normalize() would silently return zero hits for
  // affected words — fail fast with the remedy instead. Indexes
  // without the key predate the check and were built under the current
  // folds (see Tokenizer.NormalizerVersion).
  stats.get("normalizerVersion").foreach(v =>
    require(v.toInt == Tokenizer.NormalizerVersion,
      s"index at $indexDir was built with normalizer version ${v.toInt} " +
        s"but this engine folds with version ${Tokenizer.NormalizerVersion}: " +
        "rebuild the index (terms on disk no longer match query-side folding)"))
  val termBuckets: Int = stats("termBuckets").toInt
  val docsPerShard: Int = stats("docsPerShard").toInt

  /** Dictionary access: full in-memory map below TermDict's threshold,
    * predicate-pushdown bucketed loads (length bands, prefixes, IN
    * lists) above it — the driver never holds a web-scale vocabulary. */
  val td = new graft.index.TermDict(spark, s"$indexDir/dict")

  /** Index-time stop-word setting (empty when unset); stop terms are
    * absent from the dictionary, so bag-of-words paths ignore them
    * naturally — the set is for analyzers that must drop them before
    * slot construction (MeiliRank). */
  val stopWords: Set[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/stopwords")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.parquet(s"$indexDir/stopwords").as[String].collect().toSet
    else Set.empty
  }

  /** Index-time tokenizer settings (IndexConfig.tokenizer, persisted by
    * the build): the query side MUST segment with the same settings or
    * query terms would not match indexed terms. */
  val tokSettings: Tokenizer.TokSettings = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/tokenizer")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Tokenizer.TokSettings.Default
    else {
      val r = spark.read.parquet(s"$indexDir/tokenizer").collect()(0)
      def strs(f: String): Seq[String] =
        if (!r.schema.fieldNames.contains(f)) Nil
        else Option(r.getAs[scala.collection.Seq[String]](f))
          .fold(Seq.empty[String])(_.toSeq)
      val seps = strs("separators").filter(_.nonEmpty)
      Tokenizer.TokSettings(
        seps.filter(_.length == 1).map(_.charAt(0)).toSet,
        strs("nonSeparators").filter(_.nonEmpty).map(_.charAt(0)).toSet,
        strs("dictionary").toSet,
        separatorStrings = seps.filter(_.length > 1).toSet,
        localesByFid = strs("locales")
          .map(Tokenizer.TokSettings.parseFidLocale).toMap,
        cjkUnigrams =
          if (!r.schema.fieldNames.contains("cjkUnigrams")) None
          else Option(r.getAs[String]("cjkUnigrams"))
            .filter(_.nonEmpty).map(_.toBoolean))
    }
  }

  /** Parse a query string under this index's tokenizer settings. A
    * single-field index has exactly one attribute (fid 0), so its
    * locale hint unambiguously applies to the query too — both ends
    * segment identically. Multi-field indexes keep the auto default
    * (the reference's behavior without a query `locales` param: fields
    * may carry different hints, so the query can't pick one). */
  def parseQuery(q: String): graft.query.ParsedQuery =
    graft.query.QueryParser.parse(q,
      if (fieldWeights.isEmpty) tokSettings.forFid(0) else tokSettings)

  /** [[parseQuery]] with an explicit query-side `locales` hint (the
    * reference's search-time `locales` parameter, SearchQuery.locales):
    * the first entry decides the CJK segmentation mode for the QUERY
    * string, overriding autodetect/the index-level default. Empty =
    * the default behavior above. */
  def parseQuery(q: String, locales: Seq[String]): graft.query.ParsedQuery =
    locales.headOption match {
      case None => parseQuery(q)
      case Some(loc) => graft.query.QueryParser.parse(q,
        tokSettings.copy(cjkUnigrams =
          Some(Tokenizer.TokSettings.isCjkLocale(loc))))
    }

  /** fid → weight for multi-field indexes (IndexBuild.buildMultiField);
    * empty for single-field. Lower weight = more important field
    * (reference fieldids_weights_map). */
  val fieldWeights: Map[Int, Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/fields")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.parquet(s"$indexDir/fields").select($"fid", $"weight")
        .as[(Int, Int)].collect().toMap
    else Map.empty
  }

  /** Small-mode convenience view (tests, tooling). Throws above the
    * TermDict threshold by design — engine paths use `td`. */
  lazy val dict: Map[String, Long] = td.fullMap.getOrElse(
    throw new IllegalStateException("dictionary too large to collect; use td"))

  /** Tombstoned docids (IndexBuild.delete): every read path excludes
    * them — postings/positions of deleted docs remain on disk until
    * `IndexBuild.compact` rewrites the index (the Lucene live-docs
    * model). The set is broadcast-small by contract: delete() keeps a
    * counter and compaction bounds it; the cap fails fast with a
    * compact-first message. */
  lazy val deletedDf: Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/deleted")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read.parquet(s"$indexDir/deleted").select($"docId"))
    else None
  }
  private lazy val deletedSet: Set[Int] = deletedDf match {
    case None => Set.empty
    case Some(d) =>
      val n = d.count()
      require(n <= SearchEngine.TombstoneCap,
        s"$n tombstones exceed the broadcastable cap (${SearchEngine.TombstoneCap}): run IndexBuild.compact")
      d.as[Int].collect().toSet
  }
  /** Restrict a (docId, …) DataFrame to live docs. */
  private def liveOnly(df: DataFrame): DataFrame =
    deletedDf.fold(df)(d => df.join(broadcast(d), Seq("docId"), "left_anti"))

  /** Base DataFrame for an index table, resolved ONCE per engine:
    * `spark.read.parquet` re-lists files and re-reads footers on every
    * call — a 1-task Spark job per invocation that showed up as 1-3
    * extra jobs on EVERY query (QueryJobs dev tool). The engine is a
    * snapshot of the index (documented at the class header), so the
    * cached listing is exactly as stale as every other loaded table. */
  private val tableDFs =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def tableDF(table: String): DataFrame =
    tableDFs.getOrElseUpdate(table, spark.read.parquet(s"$indexDir/$table"))

  /** Doc store WITHOUT the derived `len` column (unless the index is an
    * old layout that stored it physically) — the cheap view for paths
    * that don't need the BM25 norm. */
  lazy val docsRaw: DataFrame = liveOnly(spark.read.parquet(s"$indexDir/docs"))

  /** True iff this index persisted a positions table (phrase /
    * proximity / attribute rules and any fid-restricted read need it;
    * callers that would otherwise fail mid-query with an opaque
    * missing-path AnalysisException check this up front). */
  lazy val hasPositions: Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/positions")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Narrow (docId, len) table — the BM25-norm lookup side. Reads the
    * dedicated doclen/ parquet (written by the build's single tokenize
    * pass); falls back to the docs `len` column for pre-doclen layouts. */
  lazy val doclen: DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/doclen")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) liveOnly(IndexBuild.readDoclen(spark, indexDir))
    else docsRaw.select($"docId", $"len")
  }

  /** Full doc view including `len` (joined from [[doclen]] when the
    * layout keeps it separate) — the back-compat surface for filters,
    * facets and field distribution; hot paths use [[doclen]]/[[docsRaw]]
    * directly. */
  lazy val docs: DataFrame =
    if (docsRaw.columns.contains("len")) docsRaw
    else docsRaw.join(doclen, Seq("docId"))

  /** Dictionary-resolved QueryTerms for already-tokenized terms. */
  def termsOf(ts: Seq[String]): Seq[QueryTerm] = {
    val dts = ts.distinct
    val dfs = td.lookup(dts)
    dts.flatMap { t =>
      dfs.get(t).map(df =>
        QueryTerm(t, df, BM25.idf(df, nDocs), IndexBuild.bucketOf(t, termBuckets)))
    }
  }

  /** Query analysis: quoted phrases and `-` negatives are parsed from
    * the query string (reference parse_query.rs:25-192); all positive
    * terms (bag + phrase words) participate in ranking. */
  def analyze(q: String): Seq[QueryTerm] =
    termsOf(parseQuery(q).positiveTerms)

  /** Universe restrictions implied by query syntax: docs that contain
    * every quoted phrase (semi-join side) and docs matching any negative
    * word/phrase (anti-join side, reference search/new/mod.rs:268-295).
    * `fids` (attributesToSearchOn) restricts phrase AND negative
    * resolution to the searched fields — every universe restriction
    * must see the same field set the slot matching does (reference
    * routes phrase resolution through restricted_fids too). Phrases
    * made ENTIRELY of stop words restrict nothing. */
  private[graft] def syntaxDocs(pq: graft.query.ParsedQuery,
                                fids: Option[Set[Int]] = None)
      : (Option[DataFrame], Option[DataFrame]) = {
    val pos = pq.phrases
      .filter(_.exists(w => !stopWords.contains(Tokenizer.normalize(w))))
      .map(ws => phrase(ws, fids))
      .reduceOption((a, b) => a.join(b, Seq("docId"), "left_semi"))
    val negWordDocs = {
      val negTerms = termsOf(pq.negWords)
      if (negTerms.isEmpty) Nil
      else fids match {
        case Some(_) =>
          Seq(positionRows(negTerms.map(_.term), fids).select($"docId").distinct())
        case None => Seq(decoded(negTerms).toDF().select($"docId"))
      }
    }
    val negPhraseDocs = pq.negPhrases
      .filter(_.exists(w => !stopWords.contains(Tokenizer.normalize(w))))
      .map(ws => phrase(ws, fids).select($"docId"))
    val negs = (negWordDocs ++ negPhraseDocs).reduceOption(_.unionByName(_))
    (pos, negs.map(_.distinct()))
  }

  /** Posting blocks for the given terms: bucket partition pruning + term
    * predicate pushed down to the parquet scan. `table` selects the
    * block store ("postings", or "prefixes" for precomputed prefix
    * blocks — same layout, same pruning). */
  def blocksFor(terms: Seq[QueryTerm], table: String = "postings"): DataFrame = {
    val buckets = terms.map(_.bucket).distinct
    tableDF(table)
      .filter($"bucket".isin(buckets: _*) && $"term".isin(terms.map(_.term): _*))
  }

  /** Decode blocks into (docId, term, tf) rows (narrow flatMap);
    * tombstoned docids are dropped during decode. `shardCap` bounds the
    * decode to the first N docid shards (degraded-search work budget) —
    * the predicate is pushed to the parquet block scan, so capped
    * shards are never read, let alone decoded. */
  def decoded(terms: Seq[QueryTerm], shardCap: Option[Int] = None,
              table: String = "postings"): Dataset[Posting] = {
    val del = deletedSet
    val blocks = shardCap.fold(blocksFor(terms, table))(c =>
      blocksFor(terms, table).filter($"shard" < c))
    blocks.select($"term", $"docBytes", $"tfBytes")
      .as[(String, Array[Byte], Array[Byte])]
      .flatMap { case (term, db, tb) =>
        val ids = VByte.decodeDeltas(db); val tfs = VByte.decode(tb)
        val it = ids.iterator.zip(tfs.iterator)
          .map { case (d, tf) => Posting(d, term, tf) }
        if (del.isEmpty) it else it.filter(p => !del.contains(p.docId))
      }
  }

  /** Declarative BM25 search. `conjunctive=true` = AND semantics (docs
    * matching all query terms), false = OR. `candidates` (optional)
    * restricts the universe (filter-before-rank, reference
    * search/new/mod.rs:590-601). */
  def searchDF(q: String, k: Int, conjunctive: Boolean = true,
               candidates: Option[DataFrame] = None,
               shardCap: Option[Int] = None): DataFrame = {
    val pq = parseQuery(q)
    val terms = termsOf(pq.positiveTerms)
    if (terms.isEmpty) return spark.emptyDataset[Hit].toDF()
    val idfDf = terms.map(t => (t.term, t.idf)).toDF("term", "idf")
    val base = decoded(terms, shardCap).toDF()
    val afterCand = candidates match {
      case Some(c) => base.join(broadcast(c.select($"docId")), Seq("docId"), "left_semi")
      case None => base
    }
    // quoted phrases / negative terms restrict the universe BEFORE
    // scoring (filter-before-rank; per-doc BM25 is universe-independent)
    val (phraseDocs, negDocs) = syntaxDocs(pq)
    val afterPhrase = phraseDocs.fold(afterCand)(p =>
      afterCand.join(p.select($"docId"), Seq("docId"), "left_semi"))
    val universe = negDocs.fold(afterPhrase)(nd =>
      afterPhrase.join(nd, Seq("docId"), "left_anti"))
    // cost-gated join strategy: typical-query postings are small →
    // broadcast THEM into the doclen lookup join (docs table on the
    // probe side; the 10^12-row docs table is never shuffled). But a
    // stop-word term's postings are O(corpus) — broadcasting them OOMs
    // the executors at scale, so above the Σdf cap the join shuffles
    // (and high-df queries should prefer searchWand, which never
    // materializes per-doc posting rows at all).
    val joined = universe.join(broadcast(idfDf), Seq("term"))
    val postingRows = terms.map(_.df).sum
    val withLen = doclen
      .join(if (postingRows <= broadcastDfCap) broadcast(joined) else joined,
        Seq("docId"))
      .withColumn("tscore", $"idf" * $"tf" * lit(BM25.K1 + 1.0) /
        ($"tf" + lit(BM25.K1) * (lit(1.0 - BM25.B) + lit(BM25.B) * $"len" / lit(avgdl))))
    // deterministic f64 evaluation order: sum per-term scores in
    // ascending term order (SURVEY §7(e)) so ranks are bit-stable
    // across parallelism levels and across the WAND plan
    val agg = withLen.groupBy($"docId")
      .agg(count(lit(1)).as("nMatched"),
        aggregate(array_sort(collect_list(struct($"term", $"tscore"))),
          lit(0.0), (acc, x) => acc + x.getField("tscore")).as("score"))
    val filtered = if (conjunctive) agg.filter($"nMatched" === terms.size) else agg
    filtered.select($"docId", $"score")
      .orderBy($"score".desc, $"docId".asc).limit(k)
  }

  /** Work-budget degraded search (reference T4 searchCutoffMs,
    * meilisearch search cutoff: return the best buckets found when the
    * time budget expires and flag the response `degraded`). A wall-
    * clock cutoff is nondeterministic in a distributed batch engine, so
    * the budget is re-expressed as WORK: decode only the first
    * `maxShards` docid shards of each term's postings — a docid-order
    * prefix of the corpus, the same order the reference's bucket
    * iteration visits candidates — and rank that subset with the
    * index-global statistics (idf/avgdl unchanged, exactly like the
    * reference, whose cutoff does not re-estimate statistics).
    * The shard predicate is pushed to the parquet scan: bounded shards
    * = bounded bytes read = bounded time, deterministically.
    * Returns (hits, degraded): degraded=false means the budget covered
    * every shard and the result IS the exact searchDF result. */
  def searchDegraded(q: String, k: Int, maxShards: Int,
                     conjunctive: Boolean = true): (DataFrame, Boolean) = {
    val totalShards = ((nDocs + docsPerShard - 1) / docsPerShard).toInt
    val degraded = maxShards < totalShards
    val cap = if (degraded) Some(maxShards) else None
    (searchDF(q, k, conjunctive, shardCap = cap), degraded)
  }

  /** Cost-routed search (the recommended entry point): plain queries
    * whose Σdf exceeds the broadcast cap go to block-max WAND — it
    * skips undecoded blocks and never materializes per-doc posting rows,
    * the right physical plan for stop-word-heavy queries at scale;
    * everything else takes the declarative plan. Both plans are
    * rank-identical (cross-checked in specs). */
  def search(q: String, k: Int, conjunctive: Boolean = true): DataFrame = {
    val pq = parseQuery(q)
    if (pq.isPlain && termsOf(pq.positiveTerms).map(_.df).sum > broadcastDfCap)
      searchWand(q, k, conjunctive)
    else searchDF(q, k, conjunctive)
  }

  /** Block-max WAND search: per-shard top-k inside mapGroups (the only
    * imperative operator on the read path), exact global merge. Queries
    * carrying phrase/negative syntax delegate to the declarative plan
    * (per-shard pruning cannot see cross-shard universe restrictions
    * without losing top-k exactness). */
  def searchWand(q: String, k: Int, conjunctive: Boolean = true): DataFrame = {
    val pq = parseQuery(q)
    if (!pq.isPlain) return searchDF(q, k, conjunctive)
    val terms = analyze(q)
    if (terms.isEmpty) return spark.emptyDataset[Hit].toDF()
    val termStats = terms.map(t => t.term -> t.idf).toMap
    val bTermStats = spark.sparkContext.broadcast(termStats)
    val bAvgdl = avgdl
    val conj = conjunctive
    val kk = k
    val blocks = blocksFor(terms)
      .select($"term", $"shard", $"firstDoc", $"lastDoc", $"count",
        $"docBytes", $"tfBytes", $"blockMaxTf")
      .as[Wand.Block]
    val dps = docsPerShard
    val lens = doclen.select(($"docId" / dps).cast("int").as("shard"),
      $"docId", $"len").as[(Int, Int, Int)]
    val hits = blocks.groupByKey(_.shard).cogroup(lens.groupByKey(_._1)) {
      (shard, bs, ls) =>
        val lenMap = new scala.collection.mutable.HashMap[Int, Int]
        ls.foreach(l => lenMap.update(l._2, l._3))
        Wand.topKShard(bs.toArray, lenMap, bTermStats.value, bAvgdl, kk, conj)
    }
    hits.toDF("docId", "score")
      .orderBy($"score".desc, $"docId".asc).limit(k)
  }

  /** Universe of docids matching the query (no ranking): the
    * "resolve_universe" step of the reference (search/new/mod.rs:781). */
  def candidates(q: String, conjunctive: Boolean = true): DataFrame = {
    val pq = parseQuery(q)
    val terms = termsOf(pq.positiveTerms)
    if (terms.isEmpty) return spark.range(0).select($"id".cast("int").as("docId"))
    val agg = decoded(terms).toDF().groupBy($"docId")
      .agg(count(lit(1)).as("nMatched"))
    val f = if (conjunctive) agg.filter($"nMatched" === terms.size) else agg
    val (phraseDocs, negDocs) = syntaxDocs(pq)
    val afterPhrase = phraseDocs.fold(f)(p =>
      f.join(p.select($"docId"), Seq("docId"), "left_semi"))
    negDocs.fold(afterPhrase)(nd =>
      afterPhrase.join(nd, Seq("docId"), "left_anti"))
      .select($"docId")
  }

  /** Facet distribution: value -> doc count over the query's candidates
    * (reference facet_distribution.rs:332 execute; max_values_per_facet
    * default 100, facet/mod.rs:26). */
  def facetDistribution(q: String, facetCol: String, maxValues: Int = 100): DataFrame =
    facetCountsOver(broadcast(candidates(q)), facetCol, maxValues)

  /** Facet value counts over an explicit docId universe (shared by
    * facetDistribution and the api facade's per-request facets — ONE
    * definition of the count/tie-order/limit semantics).
    *
    * `sortBy` mirrors the reference's FacetValuesSort
    * (facet_values_sort.rs): "count" = decreasing count with value-asc
    * tie-break; "alpha" = lexicographic ascending (the reference's
    * per-facet DEFAULT — the api facade defaults to it; this engine
    * helper keeps "count" for direct callers). maxValues truncates in
    * the chosen order, like the reference's bounded iteration. */
  def facetCountsOver(universe: DataFrame, facetCol: String,
                      maxValues: Int = 100,
                      sortBy: String = "count"): DataFrame = {
    val counts = docsFor(facetCol)
      .join(universe.select($"docId"), Seq("docId"), "left_semi")
      .groupBy(col(facetCol)).agg(count(lit(1)).as("n"))
    (sortBy match {
      case "count" => counts.orderBy(col("n").desc, col(facetCol).asc)
      case "alpha" => counts.orderBy(col(facetCol).asc)
      case other => throw new IllegalArgumentException(
        s"sortFacetValuesBy must be 'alpha' or 'count', got '$other'")
    }).limit(maxValues)
  }

  /** Narrowest doc view that can serve column `c` (only `len` needs the
    * doclen join). */
  private def docsFor(c: String): DataFrame =
    if (c == "len") docs else docsRaw

  /** Facet stats: numeric min/max over candidates (reference
    * facet_distribution.rs facet_stats). */
  def facetStats(q: String, numCol: Column, alias: String): DataFrame =
    docs.join(broadcast(candidates(q)), Seq("docId"), "left_semi")
      .agg(min(numCol).as(s"min_$alias"), max(numCol).as(s"max_$alias"),
        count(lit(1)).as("n"))

  /** Positions rows for the given terms (bucket-pruned scan of the
    * positions table), live docs only. `table` selects the store
    * ("positions", or "prefix_positions" for merged prefix rows). */
  def positionsFor(terms: Seq[String], table: String = "positions"): DataFrame = {
    val buckets = terms.map(IndexBuild.bucketOf(_, termBuckets)).distinct
    liveOnly(tableDF(table)
      .filter($"bucket".isin(buckets: _*) && $"term".isin(terms: _*)))
  }

  /** Exploded (docId, pos) rows for the given terms, optionally
    * restricted to a field set (attributesToSearchOn — positions carry
    * fid<<16 in multi-field indexes, reference
    * search/new/mod.rs:115-170 restricted_fids). */
  def positionRows(terms: Seq[String], fids: Option[Set[Int]] = None,
                   table: String = "positions"): DataFrame = {
    val rows = positionsFor(terms, table)
      .select($"term", $"docId", explode($"positions").as("pos"))
    fids match {
      case Some(f) =>
        rows.filter(shiftright($"pos", 16).cast("int").isin(f.toSeq: _*))
      case None => rows
    }
  }

  // ---- precomputed prefix tables (IndexBuild.buildPrefixIndex) --------

  /** Selection dictionary of materialized prefixes (None when the index
    * has no prefix tables). */
  lazy val prefixDict: Option[graft.index.TermDict] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/prefix_dict")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(new graft.index.TermDict(spark, s"$indexDir/prefix_dict"))
    else None
  }

  /** True iff `p` has a materialized merged posting list. */
  def prefixIndexed(p: String): Boolean = prefixDict.exists(_.contains(p))

  /** (term=prefix, docId) rows of a PRECOMPUTED prefix — the union of
    * all member terms' docids, read as ordinary posting blocks (one
    * bounded pruned scan, regardless of how many terms share the
    * prefix: the reference's word_prefix_docids read path). The slot
    * carries the prefix_dict df (Σ member df — an upper bound on the
    * merged doc count, since a doc holding several member terms counts
    * once per term), so prefix-bearing queries cost-route through the
    * same Σdf screen as plain terms instead of always looking cheap. */
  def prefixDocs(p: String): DataFrame =
    decoded(Seq(prefixTerm(p)), table = "prefixes")
      .toDF().select($"term", $"docId")

  /** The routing QueryTerm of a precomputed prefix: df comes from
    * prefix_dict, so downstream broadcast/WAND cost screens see the
    * prefix's real weight (a df=0 slot always looked broadcast-cheap). */
  def prefixTerm(p: String): QueryTerm = {
    val df = prefixDict.flatMap(_.lookup(Seq(p)).get(p)).getOrElse(0L)
    QueryTerm(p, df, BM25.idf(df, nDocs), IndexBuild.bucketOf(p, termBuckets))
  }

  /** Exploded (docId, pos) rows of a precomputed prefix (merged member
    * positions; fid restriction as in [[positionRows]]). */
  def prefixPositionRows(p: String, fids: Option[Set[Int]] = None): DataFrame =
    positionRows(Seq(p), fids, table = "prefix_positions")

  /** Docs where the words occur as a consecutive phrase (reference
    * compute_phrase_docids, resolve_query_graph.rs:187-268 — word bitmap
    * intersection + adjacency; here: position joins). Index-time STOP
    * WORDS inside the phrase act as position placeholders (the
    * reference keeps them as any-word slots, parse_query.rs:311-318):
    * they have no position rows, so their slot contributes no
    * constraint while the remaining words keep their original offsets —
    * "the quick fox" with "the" stopped still matches docs where
    * quick/fox sit two apart. A phrase of ONLY stop words matches every
    * doc (callers skip the restriction — see syntaxDocs). */
  def phrase(words: Seq[String], fids: Option[Set[Int]] = None): DataFrame = {
    require(words.nonEmpty)
    val ws = words.map(Tokenizer.normalize)
    val active = ws.zipWithIndex.filterNot { case (w, _) => stopWords.contains(w) }
    if (active.isEmpty) return docsRaw.select($"docId")
    val exploded = active.map { case (w, i) =>
      positionRows(Seq(w), fids).filter($"term" === w)
        .select($"docId", ($"pos" - i).as("p0"))
    }
    // doc has the phrase iff some start position p0 appears in every list
    exploded.reduce((a, b) => a.join(b, Seq("docId", "p0"), "left_semi"))
      .select($"docId").distinct()
  }

  /** Per-doc proximity between two words: the reference's asymmetric
    * distance (proximity.rs:7-15): if p2>p1 -> p2-p1 else p1-p2+1,
    * capped at 7 index-side (extract_word_pair_proximity_docids.rs:17). */
  def proximity(w1: String, w2: String, cap: Int = 7): DataFrame = {
    val a = positionsFor(Seq(Tokenizer.normalize(w1)))
      .filter($"term" === Tokenizer.normalize(w1))
      .select($"docId", explode($"positions").as("p1"))
    val b = positionsFor(Seq(Tokenizer.normalize(w2)))
      .filter($"term" === Tokenizer.normalize(w2))
      .select($"docId", explode($"positions").as("p2"))
    a.join(b, Seq("docId"))
      .withColumn("d", when($"p2" > $"p1", $"p2" - $"p1").otherwise($"p1" - $"p2" + 1))
      .groupBy($"docId")
      .agg(least(min($"d"), lit(cap)).as("prox"))
  }

  /** Docs matching `q` (AND) that do NOT contain `negTerm` (reference
    * negative terms, search/new/mod.rs:268-295: subtract from universe). */
  def negative(q: String, negTerm: String): DataFrame = {
    val neg = analyze(negTerm)
    val negDocs = if (neg.isEmpty) spark.range(0).select($"id".cast("int").as("docId"))
      else decoded(neg).toDF().select($"docId").distinct()
    candidates(q).join(negDocs, Seq("docId"), "left_anti")
  }

  /** Prefix expansion: dictionary terms starting with `prefix`
    * (reference on-the-fly word-range scan, compute_derivations.rs:45-78)
    * — a pushed-down range load in large-dict mode, capped at `cap`
    * terms (reference MAX_PREFIX_COUNT, compute_derivations.rs:215;
    * prefixes hot enough to overflow the cap should be served by the
    * precomputed tables instead — see [[prefixDocs]]). */
  def prefixTerms(prefix: String,
                  cap: Int = SearchEngine.MaxPrefixCount): Seq[String] =
    td.withPrefix(Tokenizer.normalize(prefix), cap).map(_._1).toSeq

  /** Docs matching any dictionary term with the prefix, with the count
    * of distinct matched terms. Term enumeration is capped like
    * [[prefixTerms]] (MAX_PREFIX_COUNT); a workload needing unbounded
    * prefix coverage should use the precomputed tables ([[prefixDocs]])
    * instead of enumerating. */
  def prefixSearch(prefix: String,
                   cap: Int = SearchEngine.MaxPrefixCount): DataFrame = {
    val ts = td.withPrefix(Tokenizer.normalize(prefix), cap).map { case (t, df) =>
      QueryTerm(t, df, BM25.idf(df, nDocs), IndexBuild.bucketOf(t, termBuckets))
    }.toSeq
    if (ts.isEmpty) return spark.range(0)
      .select($"id".cast("int").as("docId"), lit(0L).as("nTerms"))
    decoded(ts).toDF().groupBy($"docId")
      .agg(countDistinct($"term").as("nTerms"))
  }

  /** Typo expansion: dictionary (term, distance) pairs within `maxDist`
    * edits (reference Levenshtein-DFA ∩ words-FST,
    * compute_derivations.rs:80-165). The walk visits only dictionary
    * prefixes still within the edit budget — sub-linear in vocabulary
    * size — over the query word's length band (|len(t)-len(w)| ≤ budget
    * is a necessary condition, so only that band is even loaded). */
  def typoCandidates(word: String, maxDist: Int): Seq[(String, Int)] = {
    val w = Tokenizer.normalize(word)
    val (terms, _) = td.lengthBand(math.max(1, w.length - maxDist), w.length + maxDist)
    LevWalk(terms, w, maxDist)
  }

  def typoTerms(word: String, maxDist: Int): Seq[String] =
    typoCandidates(word, maxDist).map(_._1)

  def typoSearch(word: String, maxDist: Int): DataFrame = {
    val matched = typoTerms(word, maxDist)
    val dfs = td.lookup(matched)
    val ts = matched.map(t =>
      QueryTerm(t, dfs(t), BM25.idf(dfs(t), nDocs), IndexBuild.bucketOf(t, termBuckets)))
    if (ts.isEmpty) return spark.range(0)
      .select($"id".cast("int").as("docId"), lit(0L).as("nTerms"))
    decoded(ts).toDF().groupBy($"docId")
      .agg(countDistinct($"term").as("nTerms"))
  }

  /** Adjacent-pair doc counts for MANY (left, right) word pairs in ONE
    * job (reference split_best_frequency consults the pair-proximity-1
    * table per candidate, compute_derivations.rs:388-408 — the naive
    * re-expression ran one Spark job per candidate split, serializing
    * query analysis). */
  def adjacencyCounts(pairs: Seq[(String, String)]): Map[(String, String), Long] = {
    if (pairs.isEmpty) return Map.empty
    val words = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val pos = positionsFor(words)
      .select($"term", $"docId", explode($"positions").as("p"))
    val pdf = broadcast(pairs.toDF("l", "r"))
    pdf.join(pos.toDF("l", "docId", "p1"), Seq("l"))
      .join(pos.toDF("r", "docId", "p2"), Seq("r", "docId"))
      .where($"p2" === $"p1" + 1)
      .select($"l", $"r", $"docId").distinct()
      .groupBy($"l", $"r").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
  }

  /** Field distribution: field name -> count of docs with a value
    * (reference FieldDistribution, lib.rs:97; schema is fixed here so it
    * is per-column non-null counts). */
  def fieldDistribution(): Map[String, Long] = {
    val cols = docs.columns.filter(_ != "docId")
    val row = docs.select(cols.map(c => count(col(c)).as(c)).toIndexedSeq: _*).collect()(0)
    cols.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }

  /** Exhaustive candidate count (reference totalHits /
    * estimatedTotalHits, search/new/mod.rs:829-842; in batch Spark both
    * are exact). */
  def totalHits(q: String, conjunctive: Boolean = true,
                filter: Option[String] = None): Long = {
    val base = candidates(q, conjunctive)
    (filter match {
      case Some(f) => base.join(
        docs.filter(graft.query.FilterParser.parse(f)).select($"docId"),
        Seq("docId"), "left_semi")
      case None => base
    }).count()
  }

  /** Paginated search (reference page/hitsPerPage vs offset/limit,
    * meilisearch/src/search/mod.rs:74-77): top (offset+limit) then
    * slice — Catalyst plans TakeOrderedAndProject, so the offset skip
    * never materializes a global sort. */
  def searchPage(q: String, offset: Int, limit: Int,
                 conjunctive: Boolean = true,
                 filter: Option[String] = None): (Array[Hit], Long) = {
    val cand = filter.map(f => docs.filter(graft.query.FilterParser.parse(f)))
    val top = searchDF(q, offset + limit, conjunctive, cand)
      .as[Hit].collect().drop(offset)
    (top, totalHits(q, conjunctive, filter))
  }

  /** Value rows of a persisted facet index (IndexBuild.buildFacetIndex):
    * (value, n, docidMin, docidMax) sorted by value. The `where`
    * predicate (over `value`) is pushed into the value-sorted parquet,
    * so a range reads O(matching values) rows — the reference's facet
    * level tree walk (facet/facet_range_search.rs) re-expressed as
    * row-group pruning. Throws if the column has no facet index. */
  def facetIndex(colName: String, where: Column = lit(true)): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/facets/$colName")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no facet index for '$colName' — run IndexBuild.buildFacetIndex first")
    tableDF(s"facets/$colName").filter(where)
  }

  /** Exhaustive count of docs whose facet value satisfies `where`,
    * answered from the facet index alone (never scans the doc store —
    * counts follow the build-time snapshot, i.e. Lucene tombstone
    * semantics like every other statistic). */
  def facetRangeCount(colName: String, where: Column): Long =
    facetIndex(colName, where)
      .agg(coalesce(sum($"n"), lit(0L))).collect()(0).getLong(0)

  /** Facet-value search (reference SearchForFacetValues,
    * search/facet/search.rs:21-73): facet values of the query's
    * candidates whose normalized value starts with `facetQuery`, with
    * counts, ordered by count desc then value (OrderBy::Count). */
  def facetSearch(q: String, facetCol: String, facetQuery: String,
                  maxValues: Int = 100, typoTolerant: Boolean = false,
                  orderByLex: Boolean = false): DataFrame = {
    val norm = Tokenizer.normalize(facetQuery.trim)
    // normalize BOTH sides identically (reference normalizes the facet
    // value into facet_id_normalized_string_strings, lib.rs:378-380) —
    // lower() alone would never match a diacritic value ('Café') against
    // its own normalized query ('cafe'). UDF runs post-agg on ≤ distinct
    // facet values, not per doc.
    val normUdf = udf((s: String) => if (s == null) null else Tokenizer.normalize(s.trim))
    val grouped = docsFor(facetCol).join(broadcast(candidates(q)), Seq("docId"), "left_semi")
      .groupBy(col(facetCol).as("value"))
      .agg(count(lit(1)).as("n"))
      .withColumn("nv", normUdf(col("value")))
    // typo-tolerant variant: the reference runs a PREFIX-accepting
    // Levenshtein DFA over the facet FST (build_dfa(is_prefix=true),
    // search/facet/search.rs:152-160) — a value matches when some
    // prefix of it is within the budget of the query, so a typo'd
    // prefix of a long facet value still hits; budget by query len
    val matched =
      if (!typoTolerant) grouped.filter(col("nv").startsWith(norm))
      else {
        val budget = Levenshtein.budgetFor(norm)
        val levUdf = udf((v: String) =>
          v != null && (v.startsWith(norm) ||
            Levenshtein.prefixDistance(v, norm) <= budget))
        grouped.filter(levUdf(col("nv")))
      }
    // reference OrderBy::Count (default) vs OrderBy::Lexicographic
    // (facet_values_sort_order setting, search/facet/search.rs)
    val ordered =
      if (orderByLex) matched.orderBy(col("value").asc)
      else matched.orderBy(col("n").desc, col("value").asc)
    ordered.drop("nv").limit(maxValues)
  }

  /** Top-k + document materialization (reference make_hits). The k
    * scored rows are cut FIRST (one job), then metadata is fetched with
    * a docId IN predicate the parquet scan prunes on — the doc store is
    * never joined wholesale (same shape as MeiliRank.search's
    * materialization). */
  def searchHits(q: String, k: Int, filter: Option[String] = None,
                 conjunctive: Boolean = true): DataFrame = {
    val cand = filter.map(f => docs.filter(graft.query.FilterParser.parse(f)))
    val top = searchDF(q, k, conjunctive, cand)
    val rows = top.collect() // ≤ k rows (page-sized)
    val ids = rows.map(_.getInt(0)).toSeq
    val topDf = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), top.schema)
    // broadcast the ≤ k-row LOCAL side (no broadcast-build job; see
    // MeiliRank.search's materialization note)
    broadcast(topDf).join(docsRaw.filter($"docId".isin(ids: _*)), Seq("docId"))
      .select($"docId", $"score", $"repo", $"path", $"commit", $"lang")
      .orderBy($"score".desc, $"docId".asc)
  }
}

object SearchEngine {
  /** Σdf above which per-query postings stop being broadcast into the
    * doclen join: ~4M posting rows ≈ tens of MB serialized, a safe
    * executor broadcast; a skewed stop-word term (df ≈ 40% of corpus)
    * exceeds it immediately and routes to the shuffle join instead. */
  final val BroadcastDfCap: Long = 4L << 20

  /** Max tombstones held as a task-local set (4M Ints ≈ 16 MB);
    * beyond it, compact. */
  final val TombstoneCap: Long = 4L << 20

  /** On-the-fly prefix expansion cap (reference MAX_PREFIX_COUNT,
    * query_term/compute_derivations.rs:215). */
  final val MaxPrefixCount: Int = 1000
}
