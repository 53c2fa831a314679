package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable.ArrayBuffer

import graft.corpus.SourceFile
import graft.functions.{BM25, Tokenizer, VByte}

/** Index build configuration.
  *
  * @param docsPerShard docid-range width of one index shard. Shards are
  *   the unit of query-time parallelism (block-max WAND runs per shard)
  *   AND the salt of the posting shuffle: repartitioning on
  *   `(term, shard)` spreads a skewed stop-word term (`return`,
  *   `import`) over `N/docsPerShard` reducers instead of one.
  * @param termBuckets number of posting "segments" (directory
  *   partitions). Each bucket is built+committed as its own wave with
  *   its own lineage rows, so a killed build resumes at bucket
  *   granularity; at query time `bucket=hash(term)` prunes the scan to
  *   the buckets that hold the query's terms.
  * @param blockSize docids per posting block (FIXTURES.md: 128).
  */
final case class IndexConfig(
    docsPerShard: Int = 1 << 14,
    termBuckets: Int = 8,
    blockSize: Int = 128,
    numPartitions: Int = 32,
    /** also build the word-position table (phrase / proximity /
      * attribute ranking rules; reference word_position_docids,
      * index.rs:137-138). */
    positions: Boolean = false)

/** Inverted-index builder: the Spark-first re-expression of the
  * reference's document-indexing pipeline (reference:
  * crates/milli/src/update/new/indexer/mod.rs:45-240 — tokenize →
  * per-thread partial caches → merge → LMDB write; here: tokenize
  * flatMap → salted repartition by (term, shard) → sortWithinPartitions
  * → mapPartitions delta+VByte block encoder → parquet segments).
  *
  * Layout under `indexDir`:
  *   docs/      docId, repo, path, commit, lang, content, content_sha256, len
  *   dict/      term, termId, df, cf
  *   stats/     key, value  (N, avgdl, k1, b)
  *   postings/bucket=B/  term, shard, blockId, firstDoc, lastDoc, count,
  *                       docBytes, tfBytes, blockMaxTf, blockMaxScore
  *   lineage/<stage>/rows + _COMMITTED
  */
object IndexBuild {

  /** Deterministic term -> bucket (also computed query-side in plain
    * Scala; String.hashCode is specified by the JLS so it is stable
    * across JVMs and parallelism levels). */
  def bucketOf(term: String, buckets: Int): Int =
    math.floorMod(term.hashCode, buckets)

  /** Per-doc tokenize + aggregate: one TermDoc row per distinct term. */
  def termDocsOf(f: IndexedFile): Iterator[TermDoc] = {
    val toks = Tokenizer.tokenize(f.content)
    val m = scala.collection.mutable.LinkedHashMap.empty[String, (Int, Int)]
    toks.foreach { t =>
      val cur = m.getOrElse(t.term, (0, Int.MaxValue))
      m.update(t.term, (cur._1 + 1, math.min(cur._2, t.pos)))
    }
    m.iterator.map { case (term, (tf, minPos)) => TermDoc(term, f.docId, tf, minPos, 0) }
  }

  def build(spark: SparkSession, corpus: Dataset[SourceFile], indexDir: String,
            cfg: IndexConfig = IndexConfig()): Unit = {
    val indexed = DocIds.assign(spark, corpus, cfg.numPartitions)
    buildIndexed(spark, indexed, indexDir, cfg)
    indexed.unpersist()
  }

  /** Build over rows that already carry a docid (e.g. an external table
    * with a dense primary key): no global-sort id assignment needed. */
  def buildFromTable(spark: SparkSession, df: org.apache.spark.sql.DataFrame,
                     docIdCol: String, contentCol: String, langCol: String,
                     sourceCol: String, indexDir: String,
                     cfg: IndexConfig): Unit = {
    import spark.implicits._
    val indexed = df.select(
      col(docIdCol).cast("int").as("docId"),
      col(sourceCol).as("repo"),
      col(docIdCol).cast("string").as("path"),
      lit("").as("commit"),
      col(langCol).as("lang"),
      col(contentCol).as("content"))
      .as[(Int, String, String, String, String, String)]
      .map { case (id, repo, path, commit, lang, content) =>
        IndexedFile(id, repo, path, commit, lang, content, Sha.hex(content))
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    buildIndexed(spark, indexed, indexDir, cfg)
    indexed.unpersist()
  }

  def buildIndexed(spark: SparkSession, indexed: Dataset[IndexedFile],
                   indexDir: String, cfg: IndexConfig): Unit = {
    import spark.implicits._

    // ---- stage: docs (doc store + per-row sha256 invariant + doclen) --
    Lineage.stage(spark, indexDir, "docs") {
      val docs = indexed.map { f =>
        (f.docId, f.repo, f.path, f.commit, f.lang, f.content, f.contentSha256,
          Tokenizer.tokenize(f.content).length)
      }.toDF("docId", "repo", "path", "commit", "lang", "content",
        "content_sha256", "len")
      docs.write.mode("overwrite").parquet(s"$indexDir/docs")
      lineageOf(spark, s"$indexDir/docs", "docId")
    }
    val docsDf = spark.read.parquet(s"$indexDir/docs")

    // ---- tokenize pass (narrow; reused by dict + postings) -----------
    val termDocs = indexed.flatMap(termDocsOf _)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- stage: dict (term -> df, cf; termId = rank by term order) ---
    Lineage.stage(spark, indexDir, "dict") {
      val grouped = termDocs.groupBy($"term")
        .agg(count(lit(1)).as("df"), sum($"tf").as("cf"))
      // dense termId by global term order: same 2-pass rank idiom as
      // DocIds (scales; a global Window would be a 1-partition choke).
      val sorted = grouped.repartitionByRange(cfg.numPartitions, $"term")
        .sortWithinPartitions($"term")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val counts = sorted.mapPartitions(it =>
        Iterator.single((TaskContext.getPartitionId(), it.size)))(
        org.apache.spark.sql.Encoders.product[(Int, Int)])
        .collect().sortBy(_._1).map(_._2)
      val offsets = spark.sparkContext.broadcast(counts.scanLeft(0L)(_ + _))
      val dict = sorted.mapPartitions { it =>
        var id = offsets.value(TaskContext.getPartitionId())
        it.map { r =>
          val e = DictEntry(r.getString(0), id, r.getLong(1), r.getLong(2))
          id += 1; e
        }
      }(org.apache.spark.sql.Encoders.product[DictEntry])
      dict.write.mode("overwrite").parquet(s"$indexDir/dict")
      sorted.unpersist()
      lineageOf(spark, s"$indexDir/dict", null)
    }

    // ---- stage: stats -------------------------------------------------
    Lineage.stage(spark, indexDir, "stats") {
      val Array(n, avgdl) = docsDf.agg(count(lit(1)).cast("double"),
        avg($"len")).collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
      Seq(("N", n), ("avgdl", avgdl), ("k1", BM25.K1), ("b", BM25.B),
        ("docsPerShard", cfg.docsPerShard.toDouble),
        ("termBuckets", cfg.termBuckets.toDouble),
        ("blockSize", cfg.blockSize.toDouble))
        .toDF("key", "value")
        .repartition(1).write.mode("overwrite").parquet(s"$indexDir/stats")
      Nil
    }
    val stats = spark.read.parquet(s"$indexDir/stats").as[(String, Double)]
      .collect().toMap
    val nDocs = stats("N").toLong

    // ---- stage per bucket: postings -----------------------------------
    val dictDf = spark.read.parquet(s"$indexDir/dict")
    val blockSize = cfg.blockSize
    val dps = cfg.docsPerShard
    val withKeys = termDocs
      .map(td => (td.term, td.docId / dps, td.docId, td.tf,
        bucketOf(td.term, cfg.termBuckets)))
      .toDF("term", "shard", "docId", "tf", "bucket")

    (0 until cfg.termBuckets).foreach { b =>
      Lineage.stage(spark, indexDir, s"postings_bucket_$b") {
        val blocks = withKeys.filter($"bucket" === b)
          .repartition(cfg.numPartitions, $"term", $"shard")
          .sortWithinPartitions($"term", $"shard", $"docId")
          .as[(String, Int, Int, Int, Int)]
          .mapPartitions(rows => encodePartition(rows, blockSize))
          .toDF()
        // blockMaxScore from blockMaxTf + df (all codegen'd built-ins;
        // per-block max metadata for WAND, north rule)
        val scored = blocks.join(dictDf.select($"term", $"df"), Seq("term"))
          .withColumn("idf", log(lit(1.0) +
            (lit(nDocs.toDouble) - $"df" + lit(0.5)) / ($"df" + lit(0.5))))
          .withColumn("blockMaxScore", $"idf" * $"blockMaxTf" * lit(BM25.K1 + 1.0) /
            ($"blockMaxTf" + lit(BM25.K1 * (1.0 - BM25.B))))
          .drop("idf", "df")
        scored.write.mode("overwrite").parquet(s"$indexDir/postings/bucket=$b")
        postingLineage(spark, s"$indexDir/postings/bucket=$b", s"postings_bucket_$b")
      }
    }

    // ---- optional stage per bucket: word positions --------------------
    if (cfg.positions) {
      val tb = cfg.termBuckets
      val posDs = indexed.flatMap { f =>
        Tokenizer.tokenize(f.content).groupBy(_.term).iterator.map {
          case (term, toks) =>
            (term, f.docId, toks.map(_.pos).toArray, bucketOf(term, tb))
        }
      }.toDF("term", "docId", "positions", "bucket")
      (0 until cfg.termBuckets).foreach { b =>
        Lineage.stage(spark, indexDir, s"positions_bucket_$b") {
          posDs.filter($"bucket" === b).drop("bucket")
            .repartition(math.max(1, cfg.numPartitions / 2), $"term")
            .sortWithinPartitions($"term", $"docId")
            .write.mode("overwrite").parquet(s"$indexDir/positions/bucket=$b")
          Nil
        }
      }
    }

    termDocs.unpersist()
  }

  /** Streaming block encoder: input sorted by (term, shard, docId) within
    * the partition; emits one PostingBlock per `blockSize` docids of each
    * (term, shard) run. The single sanctioned imperative spot (SURVEY
    * §4.4): everything around it stays declarative. */
  def encodePartition(rows: Iterator[(String, Int, Int, Int, Int)],
                      blockSize: Int): Iterator[PostingBlock] = {
    new Iterator[PostingBlock] {
      private val it = rows.buffered
      private var out: Iterator[PostingBlock] = Iterator.empty
      override def hasNext: Boolean = out.hasNext || it.hasNext
      override def next(): PostingBlock = {
        if (!out.hasNext) {
          // pull one (term, shard) run, chunk into blocks
          val (term, shard) = (it.head._1, it.head._2)
          val docIds = new ArrayBuffer[Int](blockSize)
          val tfs = new ArrayBuffer[Int](blockSize)
          while (it.hasNext && it.head._1 == term && it.head._2 == shard) {
            val r = it.next(); docIds += r._3; tfs += r._4
          }
          out = docIds.grouped(blockSize).zip(tfs.grouped(blockSize))
            .zipWithIndex.map { case ((ds, ts), bid) =>
              val da = ds.toArray; val ta = ts.toArray
              val db = VByte.encodeDeltas(da); val tb = VByte.encode(ta)
              PostingBlock(term, shard, bid, da.head, da.last, da.length,
                db, tb, ta.max, db.length + tb.length)
            }
        }
        out.next()
      }
    }
  }

  /** Lineage rows computed from the files actually written (per parquet
    * footer row-group granularity is overkill; per-file is the segment
    * unit we commit). */
  private def lineageOf(spark: SparkSession, dir: String,
                        docIdCol: String): Seq[LineageRow] = {
    import spark.implicits._
    val df = spark.read.parquet(dir)
    val (lo, hi) =
      if (docIdCol != null) {
        val r = df.agg(min(col(docIdCol)), max(col(docIdCol))).collect()(0)
        (r.getInt(0), r.getInt(1))
      } else (0, 0)
    val n = df.count()
    val sha = Sha.hex(s"$dir:$n:$lo:$hi")
    Seq(LineageRow(dir.split('/').last, 0, lo, hi, n, dirBytes(spark, dir),
      sha, java.time.Instant.now.toString))
  }

  /** Per-shard lineage for a committed posting bucket: docid range,
    * posting count, encoded bytes, manifest sha256. Reads only the
    * small metadata columns (encBytes, not the blobs) — the lineage
    * pass is a column-pruned scan, cheap even at segment scale. */
  private def postingLineage(spark: SparkSession, dir: String,
                             stage: String): Seq[LineageRow] = {
    import spark.implicits._
    val df = spark.read.parquet(dir)
      .select($"shard", $"term", $"firstDoc", $"lastDoc", $"count", $"encBytes")
    df.groupBy($"shard").agg(
      min($"firstDoc").as("lo"), max($"lastDoc").as("hi"),
      sum($"count").as("n"),
      sum($"encBytes").as("bytes"),
      sha2(concat_ws(",", sort_array(collect_list(
        concat_ws(":", $"term", $"firstDoc", $"lastDoc", $"count")))), 256)
        .as("sha"))
      .collect().map { r =>
        LineageRow(stage, r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
          r.getLong(4), r.getString(5), java.time.Instant.now.toString)
      }.toIndexedSeq
  }

  private def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }
}
