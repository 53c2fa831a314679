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
  */
final class SearchEngine(val spark: SparkSession, val indexDir: String) extends Serializable {
  import spark.implicits._

  // ---- loaded-once index metadata (the FST/dictionary analogue) -------
  val stats: Map[String, Double] =
    spark.read.parquet(s"$indexDir/stats").as[(String, Double)].collect().toMap
  val nDocs: Long = stats("N").toLong
  val avgdl: Double = stats("avgdl")
  val termBuckets: Int = stats("termBuckets").toInt
  val docsPerShard: Int = stats("docsPerShard").toInt

  /** Sorted term dictionary, broadcast: the reference keeps an FST over
    * all words for typo/prefix expansion (index.rs:62); we broadcast a
    * sorted array + df map. Small relative to the corpus (terms grow
    * ~log of corpus size; for true web scale this would be bucketed by
    * prefix and loaded lazily). */
  lazy val dict: Map[String, Long] =
    spark.read.parquet(s"$indexDir/dict").select($"term", $"df")
      .as[(String, Long)].collect().toMap
  lazy val sortedTerms: Array[String] = dict.keys.toArray.sorted

  def docs: DataFrame = spark.read.parquet(s"$indexDir/docs")

  def analyze(q: String): Seq[QueryTerm] =
    Tokenizer.terms(q).distinct.flatMap { t =>
      dict.get(t).map(df =>
        QueryTerm(t, df, BM25.idf(df, nDocs), IndexBuild.bucketOf(t, termBuckets)))
    }

  /** Posting blocks for the given terms: bucket partition pruning + term
    * predicate pushed down to the parquet scan. */
  def blocksFor(terms: Seq[QueryTerm]): DataFrame = {
    val buckets = terms.map(_.bucket).distinct
    spark.read.parquet(s"$indexDir/postings")
      .filter($"bucket".isin(buckets: _*) && $"term".isin(terms.map(_.term): _*))
  }

  /** Decode blocks into (docId, term, tf) rows (narrow flatMap). */
  def decoded(terms: Seq[QueryTerm]): Dataset[Posting] =
    blocksFor(terms).select($"term", $"docBytes", $"tfBytes")
      .as[(String, Array[Byte], Array[Byte])]
      .flatMap { case (term, db, tb) =>
        val ids = VByte.decodeDeltas(db); val tfs = VByte.decode(tb)
        ids.iterator.zip(tfs.iterator).map { case (d, tf) => Posting(d, term, tf) }
      }

  /** Declarative BM25 search. `conjunctive=true` = AND semantics (docs
    * matching all query terms), false = OR. `candidates` (optional)
    * restricts the universe (filter-before-rank, reference
    * search/new/mod.rs:590-601). */
  def searchDF(q: String, k: Int, conjunctive: Boolean = true,
               candidates: Option[DataFrame] = None): DataFrame = {
    val terms = analyze(q)
    if (terms.isEmpty) return spark.emptyDataset[Hit].toDF()
    val idfDf = terms.map(t => (t.term, t.idf)).toDF("term", "idf")
    val base = decoded(terms).toDF()
    val universe = candidates match {
      case Some(c) => base.join(broadcast(c.select($"docId")), Seq("docId"), "left_semi")
      case None => base
    }
    // per-query postings are small → broadcast them into the doclen
    // lookup join so the big docs table is never shuffled
    val withLen = universe
      .join(broadcast(idfDf), Seq("term"))
      .join(docs.select($"docId", $"len"), Seq("docId"))
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

  /** Block-max WAND search: per-shard top-k inside mapGroups (the only
    * imperative operator on the read path), exact global merge. */
  def searchWand(q: String, k: Int, conjunctive: Boolean = true): DataFrame = {
    val terms = analyze(q)
    if (terms.isEmpty) return spark.emptyDataset[Hit].toDF()
    val termStats = terms.map(t => t.term -> t.idf).toMap
    val bTermStats = spark.sparkContext.broadcast(termStats)
    val bAvgdl = avgdl
    val conj = conjunctive
    val kk = k
    val blocks = blocksFor(terms)
      .select($"term", $"shard", $"firstDoc", $"lastDoc", $"count",
        $"docBytes", $"tfBytes", $"blockMaxScore")
      .as[Wand.Block]
    val dps = docsPerShard
    val lens = docs.select(($"docId" / dps).cast("int").as("shard"),
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

  /** Top-k + document materialization (reference make_hits). */
  def searchHits(q: String, k: Int, filter: Option[String] = None,
                 conjunctive: Boolean = true): DataFrame = {
    val cand = filter.map(f => docs.filter(graft.query.FilterParser.parse(f)))
    val top = searchDF(q, k, conjunctive, cand)
    top.join(docs, Seq("docId"))
      .select($"docId", $"score", $"repo", $"path", $"commit", $"lang")
      .orderBy($"score".desc, $"docId".asc)
  }
}
