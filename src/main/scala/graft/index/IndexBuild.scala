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
  *   partitions): at query time `bucket = hash(term)` prunes the scan
  *   to the buckets holding the query's terms.
  * @param blockSize docids per posting block (FIXTURES.md: 128).
  * @param bucketWaves build/commit each posting bucket as its own wave
  *   with its own lineage (segment-granular resume, more jobs) instead
  *   of one dynamic-partition write (fewer jobs, stage-granular resume).
  * @param positions also build the word-position table (phrase /
  *   proximity / attribute rules; reference word_position_docids,
  *   index.rs:137-138).
  */
/** @param stopWords terms excluded from postings/positions/dictionary.
  *   Positions of surrounding words are preserved (the stop word still
  *   advances the position counter) and doc `len` still counts it —
  *   reference semantics: stop words keep positions but are not indexed
  *   as terms (parse_query.rs:311-318, settings stop_words). */
/** @param storageOrderIds assign docids in CORPUS STORAGE ORDER (input
  *   file path asc, then row order within the file) instead of globally
  *   sorting by (repo, path, commit). This is the reference's own
  *   semantic — Meilisearch numbers documents by arrival order, not by
  *   key (documents/mod.rs DocumentId assignment) — and at 10^12 files
  *   it is the only sane ingest plan: id assignment becomes a zero-
  *   shuffle narrow pass (ids = per-file offset + `_metadata.row_index`)
  *   instead of a full re-sort of the corpus through one exchange
  *   (3 passes of every content byte over the wire). Requires a
  *   file-backed corpus (parquet/json scan); falls back to the sorted
  *   path otherwise. Ids remain deterministic: same files, same ids. */
/** @param chunkedShuffle map-side posting-chunk combine: before the
  *   posting exchange, each map task packs its per-(term, shard)
  *   postings into delta+VByte chunk rows, so the shuffle ships the
  *   term string once per chunk and ~3-5 bytes per posting instead of
  *   one ~32-byte (term, key) row each. This is the Spark re-expression
  *   of the reference's per-thread partial caches merged post-exchange
  *   (crates/milli/src/update/new/extract/cache.rs:281 BalancedCaches;
  *   grenad sort-merge in the old pipeline) — shuffle bytes are the
  *   build's dominant bandwidth draw, and bandwidth is what multi-core
  *   contention starves first, so fewer bytes is a direct
  *   scaling-efficiency lever. Decoded back to the exact same sorted
  *   (term, key) stream on the reduce side; output blocks are
  *   byte-identical to the row shuffle. */
final case class IndexConfig(
    docsPerShard: Int = 1 << 14,
    termBuckets: Int = 8,
    blockSize: Int = 128,
    numPartitions: Int = 32,
    bucketWaves: Boolean = false,
    positions: Boolean = false,
    stopWords: Set[String] = Set.empty,
    tokenizer: Tokenizer.TokSettings = Tokenizer.TokSettings.Default,
    storageOrderIds: Boolean = false,
    chunkedShuffle: Boolean = true)

/** Inverted-index builder: the Spark-first re-expression of the
  * reference's document-indexing pipeline (reference:
  * crates/milli/src/update/new/indexer/mod.rs:45-240 — tokenize →
  * per-thread partial caches → merge → LMDB write; here: tokenize
  * flatMap → salted repartition by (term, shard) → sortWithinPartitions
  * → mapPartitions delta+VByte block encoder → parquet segments).
  *
  * Job economy (matters for build throughput AND scaling efficiency:
  * serial driver overhead is what breaks Amdahl at 4x cores):
  *   1 sample+sort shuffle and 1 count for docid assignment, 1 write for
  *   docs(+len+sha), 1 stats agg, 1 shuffle+write for all posting
  *   buckets (unless bucketWaves), 1 column-pruned metadata scan each
  *   for dict and lineage. The tokenize passes re-read the committed
  *   docs parquet (column-pruned) instead of caching contents in the
  *   block manager — at 10^12 files caching would thrash; parquet
  *   re-scan is a narrow, spillless pass.
  *
  * Deployment note: the posting exchange is the build's dominant
  * bandwidth draw. On clusters where shuffle lands on RAM-backed or
  * shared-bus storage (tmpfs, NVMe behind one PCIe switch), set
  * `spark.io.compression.codec=zstd` — measured 1.5-2.3x faster
  * 16-core builds under memory-bandwidth pressure, neutral at low
  * concurrency (BENCH.md round 4).
  *
  * Layout under `indexDir`:
  *   docs/      docId, repo, path, commit, lang, content, content_sha256, len
  *   dict/      term, termId, df, cf
  *   stats/     key, value  (N, avgdl, k1, b, docsPerShard, termBuckets, blockSize)
  *   postings/bucket=B/  term, shard, blockId, firstDoc, lastDoc, count,
  *                       docBytes, tfBytes, blockMaxTf, tfSum, encBytes
  *   positions/bucket=B/ term, docId, positions (optional)
  *   lineage/<stage>/rows + _COMMITTED
  */
object IndexBuild {

  /** Deterministic term -> bucket (also computed query-side in plain
    * Scala; String.hashCode is specified by the JLS so it is stable
    * across JVMs and parallelism levels). */
  def bucketOf(term: String, buckets: Int): Int =
    math.floorMod(term.hashCode, buckets)

  /** Pseudo-term carrying the per-document token count (`len`, the BM25
    * norm) through the SAME tokenize pass / shuffle that builds the
    * postings or positions — the index build tokenizes each document
    * exactly ONCE (a second countTokens pass over 10^12 files would
    * double the build's dominant CPU+bandwidth cost). The NUL
    * prefix cannot be produced by the tokenizer, so it can never
    * collide with a real term or appear in a query. */
  final val LenTerm = "\u0000len"

  /** Build-side bucket assignment: [[LenTerm]] gets its own partition
    * directory `bucket=<termBuckets>` (one past the real range), so the
    * doclen extraction is a pure partition-pruned read and the sentinel
    * rows are physically DELETED from the table afterwards — query-side
    * consumers never see them. */
  def bucketOfIndexed(term: String, buckets: Int): Int =
    if (term == LenTerm) buckets else bucketOf(term, buckets)

  /** Pack one (docId, tf) posting entry into a single long — the
    * posting shuffle ships (term, key) rows only: `shard` is derivable
    * (docId / docsPerShard) and `bucket` is a function of the term, so
    * carrying them through the exchange is pure DRAM traffic (the
    * shuffle is the build's bandwidth bottleneck, and bandwidth is what
    * degrades first when executors contend — fewer bytes per row is a
    * direct scaling-efficiency lever). Sorting by (term, key) equals
    * sorting by (term, shard, docId): shard is monotone in docId. */
  @inline def packKey(docId: Int, tf: Int): Long =
    (docId.toLong << 32) | (tf.toLong & 0xffffffffL)
  @inline def keyDoc(key: Long): Int = (key >>> 32).toInt
  @inline def keyTf(key: Long): Int = key.toInt

  /** [[packKey]] as Column arithmetic — the ONE other encoding of the
    * key layout (callers producing keys from DataFrame columns). */
  def packKeyCol(docId: org.apache.spark.sql.Column,
                 tf: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    shiftleft(docId.cast("long"), 32).bitwiseOR(tf.cast("long"))

  /** The standard posting-block encode pipeline over (term, key) rows:
    * (optional map-side chunk combine →) salted repartition on
    * (term, derived shard) → in-partition sort → streaming block
    * encoder. One definition of the shuffle shape for build / append /
    * prefix / multi-field. With `cfg.chunkedShuffle` the exchange ships
    * pre-packed chunk rows (see [[chunkPartition]]) that the reduce
    * side flattens back to the identical sorted (term, key) stream —
    * same blocks out, a fraction of the shuffle bytes. */
  def encodeBlocks(df: DataFrame, cfg: IndexConfig): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val shardWidth = cfg.docsPerShard.toLong << 32
    if (cfg.chunkedShuffle) {
      df.select(col("term"), col("key")).as[(String, Long)]
        .mapPartitions(rows => chunkPartition(rows, cfg.docsPerShard))
        .toDF("term", "firstKey", "docBytes", "tfBytes")
        .repartition(cfg.numPartitions, col("term"),
          expr(s"firstKey div CAST($shardWidth AS BIGINT)"))
        .sortWithinPartitions(col("term"), col("firstKey"))
        .as[(String, Long, Array[Byte], Array[Byte])]
        .mapPartitions(rows => encodePartition(flattenChunks(rows),
          cfg.blockSize, cfg.termBuckets, cfg.docsPerShard))
        .toDF(EncodedCols: _*)
    } else {
      df.repartition(cfg.numPartitions, col("term"),
          expr(s"key div CAST($shardWidth AS BIGINT)"))
        .sortWithinPartitions(col("term"), col("key"))
        .as[(String, Long)]
        .mapPartitions(rows =>
          encodePartition(rows, cfg.blockSize, cfg.termBuckets, cfg.docsPerShard))
        .toDF(EncodedCols: _*)
    }
  }

  /** Entries buffered per map task before a full chunk flush: 2M packed
    * (docId, tf) longs ≈ 16 MB plus per-term buffer overhead — small
    * against executor memory, large enough that hot terms amortize
    * their string to nothing. */
  final val ChunkFlushEntries: Int = 1 << 21

  /** Map-side combine for the posting shuffle: groups this partition's
    * (term, key) stream into per-(term, shard) chunks — docids
    * delta+VByte, tfs VByte, exactly the block codec — and emits one
    * (term, firstKey, docBytes, tfBytes) row per chunk. A chunk never
    * spans shards (the exchange salts by shard) and its keys are sorted
    * at flush, so chunks of one (term, shard) ordered by firstKey
    * nearly always concatenate into a sorted stream ([[flattenChunks]]
    * merges the rare overlap). Memory is bounded by `flushEntries`:
    * crossing it flushes every buffer, so skewed terms simply produce
    * more chunks. */
  def chunkPartition(rows: Iterator[(String, Long)], docsPerShard: Int,
                     flushEntries: Int = ChunkFlushEntries)
      : Iterator[(String, Long, Array[Byte], Array[Byte])] =
    new Iterator[(String, Long, Array[Byte], Array[Byte])] {
      private val bufs = new scala.collection.mutable.AnyRefMap[String, ArrayBuffer[Long]]
      private var entries = 0
      private var out: Iterator[(String, Long, Array[Byte], Array[Byte])] =
        Iterator.empty

      private def chunkOf(term: String, b: ArrayBuffer[Long])
          : (String, Long, Array[Byte], Array[Byte]) = {
        val ks = b.toArray
        // file-packed scan partitions can interleave docid ranges —
        // sort restores strict order (a no-op pass when already sorted)
        java.util.Arrays.sort(ks)
        val docs = new Array[Int](ks.length)
        val tfs = new Array[Int](ks.length)
        var i = 0
        while (i < ks.length) { docs(i) = keyDoc(ks(i)); tfs(i) = keyTf(ks(i)); i += 1 }
        (term, ks(0), VByte.encodeDeltas(docs), VByte.encode(tfs))
      }

      private def fill(): Unit =
        while (!out.hasNext && rows.hasNext) {
          val ready = ArrayBuffer.empty[(String, Long, Array[Byte], Array[Byte])]
          while (rows.hasNext && entries < flushEntries) {
            val (t, k) = rows.next()
            val b = bufs.getOrElseUpdate(t, new ArrayBuffer[Long](4))
            if (b.nonEmpty &&
                keyDoc(b(b.length - 1)) / docsPerShard != keyDoc(k) / docsPerShard) {
              // shard boundary: seal this term's chunk, start the next
              ready += chunkOf(t, b)
              entries -= b.length
              b.clear()
            }
            b += k
            entries += 1
          }
          if (!rows.hasNext || entries >= flushEntries) {
            bufs.foreach { case (t, b) => if (b.nonEmpty) ready += chunkOf(t, b) }
            bufs.clear()
            entries = 0
          }
          out = ready.iterator
        }

      override def hasNext: Boolean = { fill(); out.hasNext }
      override def next(): (String, Long, Array[Byte], Array[Byte]) = {
        fill(); out.next()
      }
    }

  /** [[chunkPartition]] for POSITION rows: packs this partition's
    * (term, docId, positions, tf) stream into per-(term, shard) chunk
    * rows (term, firstKey, docBytes, tfBytes, posBytes). The positions
    * payload is one VByte stream per chunk — `[nPos, pos...]` per doc
    * in docid order — so the exchange ships ~2-3 bytes per position
    * instead of a boxed array element inside a ~64-byte row. Inverse:
    * [[flattenPositionChunks]]; the written table is identical. */
  def chunkPositionRows(rows: Iterator[(String, Int, Array[Int], Int)],
                        docsPerShard: Int,
                        flushEntries: Int = ChunkFlushEntries)
      : Iterator[(String, Long, Array[Byte], Array[Byte], Array[Byte])] =
    new Iterator[(String, Long, Array[Byte], Array[Byte], Array[Byte])] {
      private final class Buf {
        val keys = new ArrayBuffer[Long](4)
        val pos = new ArrayBuffer[Array[Int]](4)
        /** buffered ints this buffer holds (keys + position elements) —
          * the unit the flush budget charges, so the stated ~16 MB
          * bound covers the POSITION ARRAYS too (a position-heavy
          * corpus would otherwise buffer `flushEntries` docs' worth of
          * arrays, far past the documented envelope). */
        var units = 0
      }
      private val bufs = new scala.collection.mutable.AnyRefMap[String, Buf]
      private var entries = 0
      private var out: Iterator[(String, Long, Array[Byte], Array[Byte], Array[Byte])] =
        Iterator.empty

      private def chunkOf(term: String, b: Buf)
          : (String, Long, Array[Byte], Array[Byte], Array[Byte]) = {
        val n = b.keys.length
        val order = (0 until n).sortBy(i => b.keys(i)).toArray
        val docs = new Array[Int](n)
        val tfs = new Array[Int](n)
        var posInts = 0
        var i = 0
        while (i < n) {
          val k = b.keys(order(i))
          docs(i) = keyDoc(k); tfs(i) = keyTf(k)
          posInts += b.pos(order(i)).length + 1
          i += 1
        }
        val stream = new Array[Int](posInts)
        var o = 0
        i = 0
        while (i < n) {
          val ps = b.pos(order(i))
          stream(o) = ps.length; o += 1
          System.arraycopy(ps, 0, stream, o, ps.length); o += ps.length
          i += 1
        }
        (term, b.keys(order(0)), VByte.encodeDeltas(docs), VByte.encode(tfs),
          VByte.encode(stream))
      }

      private def fill(): Unit =
        while (!out.hasNext && rows.hasNext) {
          val ready =
            ArrayBuffer.empty[(String, Long, Array[Byte], Array[Byte], Array[Byte])]
          while (rows.hasNext && entries < flushEntries) {
            val (t, d, ps, tf) = rows.next()
            val b = bufs.getOrElseUpdate(t, new Buf)
            if (b.keys.nonEmpty &&
                keyDoc(b.keys(b.keys.length - 1)) / docsPerShard != d / docsPerShard) {
              ready += chunkOf(t, b)
              entries -= b.units
              b.keys.clear(); b.pos.clear(); b.units = 0
            }
            b.keys += packKey(d, tf)
            b.pos += ps
            // charge keys AND position ints against the budget
            b.units += ps.length + 1
            entries += ps.length + 1
          }
          if (!rows.hasNext || entries >= flushEntries) {
            bufs.foreach { case (t, b) => if (b.keys.nonEmpty) ready += chunkOf(t, b) }
            bufs.clear()
            entries = 0
          }
          out = ready.iterator
        }

      override def hasNext: Boolean = { fill(); out.hasNext }
      override def next(): (String, Long, Array[Byte], Array[Byte], Array[Byte]) = {
        fill(); out.next()
      }
    }

  /** Reduce-side inverse of [[chunkPositionRows]]: sorted chunk rows →
    * the sorted (term, docId, positions, tf, bucket) row stream the
    * positions table stores (bucket re-derived from the term). Same
    * overlap-merge contract as [[flattenChunks]]. */
  def flattenPositionChunks(
      rows: Iterator[(String, Long, Array[Byte], Array[Byte], Array[Byte])],
      termBuckets: Int): Iterator[(String, Int, Array[Int], Int, Int)] =
    new Iterator[(String, Int, Array[Int], Int, Int)] {
      private val it = rows.buffered
      private var term: String = null
      private var bucket = 0
      private var keys: Array[Long] = Array.emptyLongArray
      private var poss: Array[Array[Int]] = Array.empty
      private var pos = 0

      private def decode(c: (String, Long, Array[Byte], Array[Byte], Array[Byte]))
          : (Array[Long], Array[Array[Int]]) = {
        val docs = VByte.decodeDeltas(c._3)
        val tfs = VByte.decode(c._4)
        val stream = VByte.decode(c._5)
        val ks = new Array[Long](docs.length)
        val ps = new Array[Array[Int]](docs.length)
        var i = 0
        var o = 0
        while (i < docs.length) {
          ks(i) = packKey(docs(i), tfs(i))
          val n = stream(o); o += 1
          ps(i) = java.util.Arrays.copyOfRange(stream, o, o + n); o += n
          i += 1
        }
        (ks, ps)
      }

      private def refill(): Unit = {
        val head = it.next()
        term = head._1
        bucket = bucketOfIndexed(term, termBuckets)
        var (ks, ps) = decode(head)
        while (it.hasNext && it.head._1 == term &&
               keyDoc(it.head._2) <= keyDoc(ks(ks.length - 1))) {
          val (nk, np) = decode(it.next())
          val mk = ks ++ nk
          val mp = ps ++ np
          val order = mk.indices.sortBy(i => mk(i)).toArray
          ks = order.map(i => mk(i))
          ps = order.map(i => mp(i))
        }
        keys = ks; poss = ps; pos = 0
      }

      override def hasNext: Boolean = pos < keys.length || it.hasNext
      override def next(): (String, Int, Array[Int], Int, Int) = {
        if (pos >= keys.length) refill()
        val k = keys(pos)
        val p = poss(pos)
        pos += 1
        (term, keyDoc(k), p, keyTf(k), bucket)
      }
    }

  /** The ONE positions-table write: shard-salted exchange (sentinel
    * skew — see the positions stage note) + in-partition (term, docId)
    * sort + partitionBy(bucket). With `cfg.chunkedShuffle` the exchange
    * ships packed chunks ([[chunkPositionRows]]) and unpacks to the
    * identical sorted rows before the write. */
  def writePositions(ds: Dataset[(String, Int, Array[Int], Int, Int)],
                     outDir: String, cfg: IndexConfig,
                     numPartitions: Int): Unit = {
    val spark = ds.sparkSession
    import spark.implicits._
    val shardWidth = cfg.docsPerShard.toLong << 32
    if (cfg.chunkedShuffle)
      ds.map(r => (r._1, r._2, r._3, r._4))
        .mapPartitions(rows => chunkPositionRows(rows, cfg.docsPerShard))
        .toDF("term", "firstKey", "docBytes", "tfBytes", "posBytes")
        .repartition(numPartitions, col("term"),
          expr(s"firstKey div CAST($shardWidth AS BIGINT)"))
        .sortWithinPartitions(col("term"), col("firstKey"))
        .as[(String, Long, Array[Byte], Array[Byte], Array[Byte])]
        .mapPartitions(rows => flattenPositionChunks(rows, cfg.termBuckets))
        .toDF(PositionsCols: _*)
        .write.mode("overwrite").partitionBy("bucket").parquet(outDir)
    else
      ds.toDF(PositionsCols: _*)
        .repartition(numPartitions, col("term"),
          expr(s"docId div ${cfg.docsPerShard}"))
        .sortWithinPartitions(col("term"), col("docId"))
        .write.mode("overwrite").partitionBy("bucket").parquet(outDir)
  }

  /** Reduce-side inverse of [[chunkPartition]]: chunk rows sorted by
    * (term, firstKey) → the sorted (term, key) stream
    * [[encodePartition]] expects. Consecutive same-term chunks whose
    * docid ranges overlap (possible only when a map task saw docids out
    * of order) are decoded together and merge-sorted; the common
    * disjoint case streams one chunk at a time. */
  def flattenChunks(rows: Iterator[(String, Long, Array[Byte], Array[Byte])])
      : Iterator[(String, Long)] =
    new Iterator[(String, Long)] {
      private val it = rows.buffered
      private var term: String = null
      private var keys: Array[Long] = Array.emptyLongArray
      private var pos = 0

      private def decode(c: (String, Long, Array[Byte], Array[Byte])): Array[Long] = {
        val docs = VByte.decodeDeltas(c._3)
        val tfs = VByte.decode(c._4)
        val ks = new Array[Long](docs.length)
        var i = 0
        while (i < docs.length) { ks(i) = packKey(docs(i), tfs(i)); i += 1 }
        ks
      }

      private def refill(): Unit = {
        val head = it.next()
        term = head._1
        var cur = decode(head)
        while (it.hasNext && it.head._1 == term &&
               keyDoc(it.head._2) <= keyDoc(cur(cur.length - 1))) {
          val nxt = decode(it.next())
          val merged = new Array[Long](cur.length + nxt.length)
          System.arraycopy(cur, 0, merged, 0, cur.length)
          System.arraycopy(nxt, 0, merged, cur.length, nxt.length)
          java.util.Arrays.sort(merged) // docids are globally unique → strict order
          cur = merged
        }
        keys = cur
        pos = 0
      }

      override def hasNext: Boolean = pos < keys.length || it.hasNext
      override def next(): (String, Long) = {
        if (pos >= keys.length) refill()
        val k = keys(pos)
        pos += 1
        (term, k)
      }
    }

  /** Live (non-tombstoned) documents of an index — the single
    * definition of the tombstone-exclusion join (used by facet builds,
    * compaction and dumps; the query side's SearchEngine.liveOnly is
    * the per-engine cached equivalent). */
  def liveDocs(spark: SparkSession, indexDir: String): DataFrame = {
    val docs0 = spark.read.parquet(s"$indexDir/docs")
    val delP = new org.apache.hadoop.fs.Path(s"$indexDir/deleted")
    val fs = delP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(delP))
      docs0.join(broadcast(spark.read.parquet(s"$indexDir/deleted")
        .select(col("docId"))), Seq("docId"), "left_anti")
    else docs0
  }

  /** [[liveDocs]] with the `len` column re-attached from the narrow
    * doclen table (docs/ no longer stores it physically; pre-doclen
    * index layouts that do pass through unchanged). */
  def liveDocsWithLen(spark: SparkSession, indexDir: String): DataFrame = {
    val live = liveDocs(spark, indexDir)
    if (live.columns.contains("len")) live
    else live.join(readDoclen(spark, indexDir), Seq("docId"))
  }

  /** Per-doc tokenize + aggregate: one TermDoc row per distinct term.
    * Stop words are skipped but still advanced positions (tokenize
    * already assigned them). */
  def termDocsOf(docId: Int, content: String,
                 stop: Set[String] = Set.empty,
                 tok: Tokenizer.TokSettings = Tokenizer.TokSettings.Default)
      : Iterator[TermDoc] = {
    val toks = Tokenizer.tokenize(content, tok)
    val m = scala.collection.mutable.LinkedHashMap.empty[String, (Int, Int)]
    toks.foreach { t =>
      if (stop.isEmpty || !stop.contains(t.term)) {
        val cur = m.getOrElse(t.term, (0, Int.MaxValue))
        m.update(t.term, (cur._1 + 1, math.min(cur._2, t.pos)))
      }
    }
    m.iterator.map { case (term, (tf, minPos)) => TermDoc(term, docId, tf, minPos, 0) }
  }

  def build(spark: SparkSession, corpus: Dataset[SourceFile], indexDir: String,
            cfg: IndexConfig = IndexConfig()): Unit = {
    // ---- stage: docs = docid assignment + doc store -------------------
    Lineage.stage(spark, indexDir, "docs") {
      val storageRows =
        if (cfg.storageOrderIds) docsStorageOrder(spark, corpus, indexDir)
        else None
      storageRows.getOrElse(docsSortedOrder(spark, corpus, indexDir, cfg))
    }
    buildFromDocs(spark, indexDir, cfg)
  }

  /** Dense docids by global (repo, path, commit) rank: range-shuffle +
    * per-partition counts + offset broadcast (a global Window would
    * serialize on one partition; this is the scalable 2-pass rank). */
  private def docsSortedOrder(spark: SparkSession, corpus: Dataset[SourceFile],
                              indexDir: String, cfg: IndexConfig): Seq[LineageRow] = {
    import spark.implicits._
      // InternalRow RDD here on purpose: two jobs over the SAME sorted
      // RDD reuse its shuffle map outputs (the count pass materializes
      // them, the write pass skips the exchange), and counting
      // UnsafeRows never decodes the content strings — a Dataset
      // .persist would instead build a columnar in-memory cache,
      // measured as the dominant build cost (CompressibleColumnBuilder
      // burning 30+ cpu-sec on the content strings at local[32]).
      val sortedDf = corpus.toDF()
        .repartitionByRange(cfg.numPartitions, $"repo", $"path", $"commit")
        .sortWithinPartitions($"repo", $"path", $"commit")
      val schema = sortedDf.schema
      val (iRepo, iPath, iCommit, iLang, iContent) = (
        schema.fieldIndex("repo"), schema.fieldIndex("path"),
        schema.fieldIndex("commit"), schema.fieldIndex("lang"),
        schema.fieldIndex("content"))
      val sortedRdd = sortedDf.queryExecution.toRdd
      val counts = sortedRdd
        .mapPartitionsWithIndex((pid, it) => Iterator.single((pid, it.size)))
        .collect().sortBy(_._1).map(_._2)
      val offsets = counts.scanLeft(0L)(_ + _)
      val bOffsets = spark.sparkContext.broadcast(offsets)
      spark.createDataFrame(
        sortedRdd.mapPartitionsWithIndex { (pid, it) =>
          var id = bOffsets.value(pid)
          it.map { r =>
            // per-index cap: docids are Int (2.1B docs / index); beyond
            // that, shard into multiple indexes and merge results via
            // search.Federation (the multi-index sharding story). Fail
            // fast instead of wrapping negative (VByte deltas require
            // strictly increasing ids).
            require(id <= Int.MaxValue,
              s"docId $id exceeds the per-index Int cap; shard into a new " +
                "index and merge via search.Federation")
            // metadata columns tolerate nulls (pass through like the
            // typed path always did); content cannot — there is nothing
            // to index or checksum — so fail with the contract, not an
            // NPE inside Sha
            def str(i: Int): String = if (r.isNullAt(i)) null else r.getString(i)
            require(!r.isNullAt(iContent),
              "SourceFile.content must be non-null (row " + id + ")")
            val content = r.getString(iContent)
            val row = org.apache.spark.sql.Row(id.toInt, str(iRepo),
              str(iPath), str(iCommit), str(iLang),
              content, Sha.hex(content))
            id += 1
            row
          }
        },
        org.apache.spark.sql.types.StructType.fromDDL(DocsSchemaDdl))
        .write.mode("overwrite").parquet(s"$indexDir/docs")
      // per-partition lineage from the offsets themselves — no read-back
      val rows = counts.zipWithIndex.collect { case (c, p) if c > 0 =>
        LineageRow("docs", p, offsets(p).toInt, (offsets(p) + c - 1).toInt,
          c.toLong, 0L, Sha.hex(s"docs:$p:${offsets(p)}:$c"),
          java.time.Instant.now.toString)
      }
      rows.toIndexedSeq
  }

  /** Storage-order docid assignment (cfg.storageOrderIds): ids follow
    * (input file path asc, row index within file) — the reference's
    * arrival-order DocumentId semantic — via the `_metadata` hidden
    * columns of file-backed sources. ZERO corpus shuffle: one metadata-
    * only job counts rows per file (no content column is read), then
    * the doc write is a narrow codegen'd projection joined with the
    * broadcast per-file offset table. Returns None when the corpus is
    * not a direct file scan (caller falls back to the sorted path). */
  /** True iff `df` is a BARE file scan — only column-pruning nodes
    * (Project/alias) above the source relation. A Filter, limit, join,
    * or typed map between the files and the rows would break the
    * storage-order id invariant silently: `_metadata.row_index` is the
    * PHYSICAL row index, so a corpus with rows filtered out would
    * produce per-file counts smaller than the surviving indices and
    * docids would collide across files. Such plans must take the
    * sorted fallback. */
  private def isBareFileScan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def walk(p: LogicalPlan): Boolean = p match {
      case Project(_, child)        => walk(child)
      case SubqueryAlias(_, child)  => walk(child)
      case leaf: LeafNode           => leaf.nodeName.contains("Relation")
      case _                        => false
    }
    walk(df.queryExecution.analyzed)
  }

  private def docsStorageOrder(spark: SparkSession, corpus: Dataset[SourceFile],
                               indexDir: String): Option[Seq[LineageRow]] = {
    import spark.implicits._
    val src = corpus.toDF()
    def fallBack(reason: String): Option[Seq[LineageRow]] = {
      System.err.println("[build] storageOrderIds requested but the " +
        s"corpus is not a bare file scan ($reason) — falling back to " +
        "sorted docid assignment")
      None
    }
    if (!isBareFileScan(src))
      return fallBack("plan has filter/limit/join/transform nodes")
    val counts =
      try {
        // analysis of BOTH _metadata columns up front: a source without
        // row_index support (e.g. a JSON scan) throws here, before any
        // job runs, and takes the fallback
        src.select(col("_metadata.file_path"), col("_metadata.row_index"))
        src.select(col("_metadata.file_path").as("_file"))
          .groupBy($"_file").count()
          .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      } catch {
        case _: org.apache.spark.sql.AnalysisException =>
          return fallBack("_metadata file_path/row_index unavailable")
      }
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _)
    require(offsets.last <= Int.MaxValue.toLong + 1,
      s"${offsets.last} docs exceed the per-index Int cap; shard into " +
        "multiple indexes and merge via search.Federation")
    val offDf = counts.map(_._1).zip(offsets).toSeq.toDF("_file", "_off")
    src
      .select(col("_metadata.file_path").as("_file"),
        col("_metadata.row_index").as("_ri"),
        $"repo", $"path", $"commit", $"lang", $"content")
      .join(broadcast(offDf), Seq("_file"))
      .select(($"_off" + $"_ri").cast("int").as("docId"),
        $"repo", $"path", $"commit", $"lang", $"content",
        sha2($"content", 256).as("content_sha256"))
      .write.mode("overwrite").parquet(s"$indexDir/docs")
    Some(counts.zip(offsets).zipWithIndex.collect {
      case (((f, c), off), p) if c > 0 =>
        LineageRow("docs", p, off.toInt, (off + c - 1).toInt, c, 0L,
          Sha.hex(s"docs:$f:$off:$c"), java.time.Instant.now.toString)
    }.toIndexedSeq)
  }

  /** Post-docs build stages (the ONE tokenize pass → postings/positions
    * + doclen → dict → stats); shared by [[build]] and
    * [[buildFromTable]]. The corpus content is tokenized exactly once:
    * the token stream flows into EITHER the positions table (when
    * enabled; postings then derive from a narrow (term, docId, tf) scan
    * of it) OR straight into the posting shuffle. Per-doc token counts
    * ride along as [[LenTerm]] sentinel rows and land in doclen/. */
  private def buildFromDocs(spark: SparkSession, indexDir: String,
                            cfg: IndexConfig): Unit = {
    import spark.implicits._
    val tok = cfg.tokenizer
    val docsDf = spark.read.parquet(s"$indexDir/docs")
    val tb = cfg.termBuckets
    val stop = cfg.stopWords

    if (cfg.positions) {
      // positions FIRST (single tokenize; per-doc grouping is doc-local,
      // so the only shuffle is the by-term repartition for the write).
      // The repartition is salted by derived shard: partitionBy(bucket)
      // already controls on-disk placement, and without the salt every
      // [[LenTerm]] sentinel row (one per document) hashes to ONE
      // reducer — a single task sorting and writing a row per document,
      // a hard skew wall at the 10^12-doc design target.
      Lineage.stage(spark, indexDir, "positions") {
        writePositions(
          docsDf.select($"docId", $"content").as[(Int, String)]
            .flatMap { case (id, c) => positionRowsOf(id, Seq(c), stop, tok, tb) },
          s"$indexDir/positions", cfg, cfg.numPartitions)
        Nil
      }
      doclenStage(spark, indexDir, cfg, fromPositions = true)
      // postings derive from a narrow column-pruned (term, docId, tf)
      // scan of the committed positions — never a second tokenize
      def termKeys(b: Option[Int]): DataFrame = {
        val base = spark.read.parquet(s"$indexDir/positions")
        b.fold(base.filter($"bucket" =!= tb))(bb => base.filter($"bucket" === bb))
          .select($"term", packKeyCol($"docId", $"tf").as("key"))
      }
      if (cfg.bucketWaves) {
        (0 until tb).foreach { b =>
          Lineage.stage(spark, indexDir, s"postings_bucket_$b") {
            encodeBlocks(termKeys(Some(b)), cfg).drop("bucket")
              .write.mode("overwrite").parquet(s"$indexDir/postings/bucket=$b")
            postingLineage(spark, s"$indexDir/postings/bucket=$b", s"postings_bucket_$b")
          }
        }
      } else {
        Lineage.stage(spark, indexDir, "postings") {
          encodeBlocks(termKeys(None), cfg)
            .write.mode("overwrite").partitionBy("bucket")
            .parquet(s"$indexDir/postings")
          postingLineage(spark, s"$indexDir/postings", "postings")
        }
      }
    } else {
      // no positions: the tokenize pass feeds the posting shuffle
      // directly; sentinel len rows ride the same shuffle. forFid(0):
      // a single-field index's content is field 0, so its locale hint
      // applies identically with or without positions
      val tok0 = tok.forFid(0)
      def termDocKeys: Dataset[(String, Long)] = docsDf.select($"docId", $"content")
        .as[(Int, String)]
        .flatMap { case (id, c) =>
          val toks = Tokenizer.tokenize(c, tok0)
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Int]
          toks.foreach { t =>
            if (stop.isEmpty || !stop.contains(t.term))
              m.update(t.term, m.getOrElse(t.term, 0) + 1)
          }
          m.iterator.map { case (term, tf) => (term, packKey(id, tf)) } ++
            Iterator.single((LenTerm, packKey(id, toks.length)))
        }
      def encoded(ds: Dataset[(String, Long)]): DataFrame =
        encodeBlocks(ds.toDF("term", "key"), cfg)

      if (cfg.bucketWaves) {
        (0 until tb).foreach { b =>
          Lineage.stage(spark, indexDir, s"postings_bucket_$b") {
            encoded(termDocKeys.filter(t => bucketOfIndexed(t._1, tb) == b)).drop("bucket")
              .write.mode("overwrite").parquet(s"$indexDir/postings/bucket=$b")
            postingLineage(spark, s"$indexDir/postings/bucket=$b", s"postings_bucket_$b")
          }
        }
        // wave path: doclen straight from the sentinel keys (the waves
        // re-tokenize per bucket by design, so one more pass for the
        // tiny doclen table is the simpler trade than encode+decode)
        Lineage.stage(spark, indexDir, "doclen") {
          termDocKeys.filter(_._1 == LenTerm)
            .map(t => (keyDoc(t._2), keyTf(t._2)))
            .toDF("docId", "len")
            .write.mode("overwrite").parquet(s"$indexDir/doclen")
          Nil
        }
      } else {
        Lineage.stage(spark, indexDir, "postings") {
          encoded(termDocKeys)
            .write.mode("overwrite").partitionBy("bucket")
            .parquet(s"$indexDir/postings")
          // doclen extraction FUSED into this stage (the reason it used
          // to be two extra stages — a partial-sentinel kill window —
          // is gone: a kill anywhere in here re-runs the whole stage
          // from a clean overwrite)
          extractDoclenEncoded(spark, indexDir, cfg)
          postingLineage(spark, s"$indexDir/postings", "postings")
        }
        doclenStage(spark, indexDir, cfg, fromPositions = false)
      }
    }

    // ---- stage: dict — derived from posting-block metadata -------------
    // df = sum of block counts, cf = sum of block tf sums: a column-
    // pruned scan of what was just committed; no extra shuffle over the
    // token stream, and the dict provably agrees with the postings.
    Lineage.stage(spark, indexDir, "dict") {
      writeDict(spark, indexDir)
      Nil
    }

    // ---- stage: stats — N and Σlen from the (narrow) doclen table ------
    Lineage.stage(spark, indexDir, "stats") {
      writeStats(spark, indexDir, cfg)
      // persist the stop-word setting so the query side agrees with the
      // index by construction
      if (cfg.stopWords.nonEmpty)
        cfg.stopWords.toSeq.sorted.toDF("term").repartition(1)
          .write.mode("overwrite").parquet(s"$indexDir/stopwords")
      Nil
    }
  }

  /** docs/ schema (the `len` column of earlier layouts now lives in the
    * narrow doclen/ table — SearchEngine.docs re-attaches it). */
  final val DocsSchemaDdl =
    "docId INT, repo STRING, path STRING, commit STRING, lang STRING, " +
      "content STRING, content_sha256 STRING"

  final val PositionsCols: Seq[String] =
    Seq("term", "docId", "positions", "tf", "bucket")

  /** One document's position-table rows from ONE tokenize call: per-term
    * occurrence positions (stop words excluded, positions clamped to
    * 0xffff, `tf` = occurrence count so postings derive without reading
    * the arrays) followed by the [[LenTerm]] sentinel whose tf is the
    * FULL token count including stop words (the BM25 `len` norm).
    * `fields` are tokenized in fid order; positions carry fid<<16 for
    * multi-field (reference lib.rs:201-208). */
  def positionRowsOf(docId: Int, fields: Seq[String], stop: Set[String],
                     tok: Tokenizer.TokSettings, termBuckets: Int)
      : Iterator[(String, Int, Array[Int], Int, Int)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, ArrayBuffer[Int]]
    var total = 0
    var fid = 0
    fields.foreach { f =>
      // per-field locale hints resolve the CJK unigram mode for THIS
      // fid (Tokenizer.TokSettings.forFid; no-op without localesByFid)
      val toks = Tokenizer.tokenize(f, tok.forFid(fid))
      total += toks.length
      toks.foreach { t =>
        if (stop.isEmpty || !stop.contains(t.term))
          m.getOrElseUpdate(t.term, new ArrayBuffer[Int]) +=
            ((fid << 16) | math.min(t.pos, 0xffff))
      }
      fid += 1
    }
    m.iterator.map { case (term, ps) =>
      (term, docId, ps.toArray, ps.length, bucketOfIndexed(term, termBuckets))
    } ++ Iterator.single((LenTerm, docId, Array(total), total, termBuckets))
  }

  /** Decode the encoded [[LenTerm]] sentinel blocks (postings
    * `bucket=<termBuckets>`) into the narrow doclen/ table, then delete
    * the sentinel partition. Called INSIDE the postings stage: a kill
    * anywhere in the sequence re-runs the whole stage from a clean
    * overwrite, so there is no partial-sentinel window (the reason the
    * extraction used to be two extra lineage stages). No repartition:
    * the decoded rows inherit the shard-salted, docId-sorted layout of
    * the sentinel blocks. */
  private def extractDoclenEncoded(spark: SparkSession, indexDir: String,
                                   cfg: IndexConfig): Unit = {
    import spark.implicits._
    val sentinelDir = new org.apache.hadoop.fs.Path(
      s"$indexDir/postings/bucket=${cfg.termBuckets}")
    val fs = sentinelDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(sentinelDir)) {
      spark.read.parquet(sentinelDir.toString)
        .select($"docBytes", $"tfBytes")
        .as[(Array[Byte], Array[Byte])]
        .flatMap { case (db, tfb) =>
          VByte.decodeDeltas(db).iterator.zip(VByte.decode(tfb).iterator)
        }
        .toDF("docId", "len")
        .write.mode("overwrite").parquet(s"$indexDir/doclen")
      fs.delete(sentinelDir, true): Unit
    }
  }

  /** The doclen/ commit stage.
    *
    * Positions path: ZERO Spark jobs — the sentinel partition
    * (`positions/bucket=<termBuckets>`, one (docId, tf=len) row per
    * document, shard-salted and docId-sorted by the positions write) IS
    * the doclen table; it is claimed by an atomic directory rename.
    * Readers go through [[readDoclen]], which prunes the extra columns.
    * At the 10^12-doc target this also removes what used to be a full
    * (docId, len) re-shuffle + rewrite of one row per corpus document.
    *
    * Non-positions path: extraction is fused into the postings stage
    * ([[extractDoclenEncoded]]); this stage is the cross-version /
    * empty-corpus guard — it only acts when doclen/ is still missing
    * (pre-fusion postings commit, pre-doclen docs layout, or an empty
    * corpus). */
  private def doclenStage(spark: SparkSession, indexDir: String,
                          cfg: IndexConfig, fromPositions: Boolean): Unit = {
    import spark.implicits._
    val src = if (fromPositions) "positions" else "postings"
    val sentinelDir = new org.apache.hadoop.fs.Path(
      s"$indexDir/$src/bucket=${cfg.termBuckets}")
    Lineage.stage(spark, indexDir, "doclen") {
      val fs = sentinelDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val doclenPath = new org.apache.hadoop.fs.Path(s"$indexDir/doclen")
      if (fromPositions && fs.exists(sentinelDir)) {
        if (fs.exists(doclenPath)) fs.delete(doclenPath, true)
        require(fs.rename(sentinelDir, doclenPath),
          s"rename $sentinelDir -> $doclenPath failed")
      } else if (!fromPositions && fs.exists(sentinelDir)) {
        // cross-version resume: postings committed by a layout that had
        // not fused the extraction — run it here
        extractDoclenEncoded(spark, indexDir, cfg)
      } else if (!fs.exists(doclenPath)) {
        // no sentinel and no doclen: either a pre-doclen layout resumed
        // in place (docs/ still carries len — derive from it), or a
        // genuinely empty corpus (commit an empty doclen so
        // stats/readers work)
        val docs0 = spark.read.parquet(s"$indexDir/docs")
        (if (docs0.columns.contains("len")) docs0.select($"docId", $"len")
         else docs0.select($"docId", lit(0).cast("int").as("len")).limit(0))
          .write.mode("overwrite").parquet(s"$indexDir/doclen")
      }
      Nil
    }: Unit
  }

  /** The narrow (docId, len) doc-length view, whatever the physical
    * doclen/ layout: projected (docId, len) files (non-positions builds,
    * appends, legacy), or the renamed positions sentinel partition
    * where `tf` carries the length and extra columns are pruned by a
    * fixed read schema. The single definition for every reader (stats,
    * docs views, SearchEngine). */
  def readDoclen(spark: SparkSession, indexDir: String): DataFrame = {
    val df = spark.read.parquet(s"$indexDir/doclen")
    if (df.columns.contains("len")) df.select("docId", "len")
    else
      spark.read.schema("docId INT, tf INT").parquet(s"$indexDir/doclen")
        .select(col("docId"), col("tf").as("len"))
  }

  /** dict/ from a column-pruned posting-metadata scan (shared by build
    * and append; the [[LenTerm]] filter is pure defense — the sentinel
    * partition is extracted and deleted before dict derivation). */
  private def writeDict(spark: SparkSession, indexDir: String): Unit = {
    import spark.implicits._
    spark.read.parquet(s"$indexDir/postings")
      .filter($"term" =!= LenTerm)
      .groupBy($"term")
      .agg(sum($"count").as("df"), sum($"tfSum").as("cf"))
      // len supports predicate-pushdown length-band loads (TermDict):
      // typo expansion reads only |len(t)-len(w)| <= budget rows
      .select($"term", xxhash64($"term").as("termId"), $"df", $"cf",
        length($"term").as("len"))
      .write.mode("overwrite").parquet(s"$indexDir/dict")
  }

  /** Incremental append (reference U1 del/add delta indexing,
    * update/new/extract cache deltas — here the append-only variant for
    * an immutable-per-commit corpus, SURVEY §2.9): new docs get docids
    * N.., their postings land in NEW blocks whose docid ranges sit
    * strictly above all committed blocks of the same (term, shard), so
    * readers (including the WAND cursors, which sort blocks by
    * firstDoc) see one coherent posting list with no rewrite of old
    * segments. dict and stats are recomputed from the (cheap) posting
    * metadata scan. Each batch commits its own lineage stage, so a
    * killed append resumes like a build. */
  def append(spark: SparkSession, delta: Dataset[SourceFile], indexDir: String,
             cfg: IndexConfig, batchId: String): Unit = {
    import spark.implicits._
    val tok = cfg.tokenizer

    Lineage.stage(spark, indexDir, s"docs_delta_$batchId") {
      // base read INSIDE the stage: on resume the stage is skipped, so a
      // kill between the two stages can't shift the batch's docid range
      val base = spark.read.parquet(s"$indexDir/docs")
        .agg(coalesce(max($"docId"), lit(-1))).collect()(0).getInt(0) + 1
      val sortedRdd = delta
        .repartitionByRange(cfg.numPartitions, $"repo", $"path", $"commit")
        .sortWithinPartitions($"repo", $"path", $"commit")
        .as[SourceFile].rdd
      val counts = sortedRdd
        .mapPartitionsWithIndex((pid, it) => Iterator.single((pid, it.size)))
        .collect().sortBy(_._1).map(_._2)
      val offsets = counts.scanLeft(base.toLong)(_ + _)
      val bOffsets = spark.sparkContext.broadcast(offsets)
      // staged write (overwrite = idempotent) + tagged publish into docs/:
      // a kill during either step re-runs the stage and converges
      val staging = s"$indexDir/_stage_docs_$batchId"
      val baseSchema = spark.read.parquet(s"$indexDir/docs").schema
      // pre-doclen (v7) layouts store len IN docs/ — delta rows must
      // match the base schema, and the batch stays on the v7
      // convention (no doclen/ delta; readers derive len from docs)
      val legacyLen = baseSchema.fieldNames.contains("len")
      spark.createDataFrame(
        sortedRdd.mapPartitionsWithIndex { (pid, it) =>
          var id = bOffsets.value(pid)
          it.map { f =>
            require(id <= Int.MaxValue,
              s"docId $id exceeds the per-index Int cap; shard into a new " +
                "index and merge via search.Federation")
            val r =
              if (legacyLen)
                org.apache.spark.sql.Row(id.toInt, f.repo, f.path,
                  f.commit, f.lang, f.content, Sha.hex(f.content),
                  Tokenizer.countTokens(f.content, tok.forFid(0)))
              else
                org.apache.spark.sql.Row(id.toInt, f.repo, f.path,
                  f.commit, f.lang, f.content, Sha.hex(f.content))
            id += 1
            r
          }
        },
        baseSchema)
        .write.mode("overwrite").parquet(staging)
      Lineage.publishAppend(spark, staging, s"$indexDir/docs", s"b$batchId")
      counts.zipWithIndex.collect { case (c, p) if c > 0 =>
        LineageRow(s"docs_delta_$batchId", p, offsets(p).toInt,
          (offsets(p) + c - 1).toInt, c.toLong, 0L,
          Sha.hex(s"docs_delta_$batchId:$p:$c"), java.time.Instant.now.toString)
      }.toIndexedSeq
    }

    Lineage.stage(spark, indexDir, s"postings_delta_$batchId") {
      // the batch's docid range comes from the COMMITTED docs_delta
      // lineage — recomputing max(docId)+1 here would (after a kill
      // between the stages) exclude the already-published delta docs,
      // committing empty postings and leaving them unsearchable
      val range = Lineage.read(spark, indexDir)
        .filter($"stage" === s"docs_delta_$batchId")
        .agg(min($"docidMin"), max($"docidMax")).collect()(0)
      if (!range.isNullAt(0)) {
        val (lo, hi) = (range.getInt(0), range.getInt(1))
        val tb = cfg.termBuckets
        val baseDocs = spark.read.parquet(s"$indexDir/docs")
        // v7 layout: len lives in docs/ (just written there by the docs
        // stage) — publishing a doclen/ delta would create a PARTIAL
        // doclen table that readers would trust over the docs column
        val legacyLen = baseDocs.columns.contains("len")
        val deltaDocs = baseDocs.filter($"docId".between(lo, hi))
        val stop = cfg.stopWords
        // ONE tokenize pass over the delta: position rows (when enabled)
        // or term keys, with sentinel len rows riding the same shuffle
        val staging = s"$indexDir/_stage_postings_$batchId"
        if (cfg.positions) {
          val pstaging = s"$indexDir/_stage_positions_$batchId"
          writePositions(
            deltaDocs.select($"docId", $"content").as[(Int, String)]
              .flatMap { case (id, c) => positionRowsOf(id, Seq(c), stop, tok, tb) },
            pstaging, cfg, math.max(1, cfg.numPartitions / 2))
          // postings delta from the STAGED positions (narrow scan, no
          // second tokenize); the sentinel partition is not published
          spark.read.parquet(pstaging).filter($"bucket" =!= tb)
            .select($"term", packKeyCol($"docId", $"tf").as("key"))
            .transform(encodeBlocks(_, cfg))
            .write.mode("overwrite").partitionBy("bucket").parquet(staging)
          if (!legacyLen) {
            // match the base doclen layout: raw (renamed sentinel,
            // read via readDoclen's fixed docId/tf schema) gets the
            // staged sentinel files moved in as-is — zero jobs; a
            // projected (docId, len) base gets a projected delta
            if (!spark.read.parquet(s"$indexDir/doclen").columns.contains("len"))
              Lineage.publishAppend(spark, s"$pstaging/bucket=$tb",
                s"$indexDir/doclen", s"b$batchId")
            else {
              val lstaging = s"$indexDir/_stage_doclen_$batchId"
              spark.read.parquet(s"$pstaging/bucket=$tb")
                .select($"docId", $"tf".as("len"))
                .repartition(1)
                .write.mode("overwrite").parquet(lstaging)
              Lineage.publishAppend(spark, lstaging, s"$indexDir/doclen", s"b$batchId")
            }
          }
          val sfs = new org.apache.hadoop.fs.Path(pstaging)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          sfs.delete(new org.apache.hadoop.fs.Path(s"$pstaging/bucket=$tb"), true)
          Lineage.publishAppend(spark, staging, s"$indexDir/postings", s"b$batchId")
          Lineage.publishAppend(spark, pstaging, s"$indexDir/positions", s"b$batchId")
        } else {
          val tok0 = tok.forFid(0) // single-field content = field 0
          deltaDocs.select($"docId", $"content").as[(Int, String)]
            .flatMap { case (id, c) =>
              val toks = Tokenizer.tokenize(c, tok0)
              val m = scala.collection.mutable.LinkedHashMap.empty[String, Int]
              toks.foreach { t =>
                if (stop.isEmpty || !stop.contains(t.term))
                  m.update(t.term, m.getOrElse(t.term, 0) + 1)
              }
              m.iterator.map { case (term, tf) => (term, packKey(id, tf)) } ++
                Iterator.single((LenTerm, packKey(id, toks.length)))
            }
            .toDF("term", "key")
            .transform(encodeBlocks(_, cfg))
            .write.mode("overwrite").partitionBy("bucket").parquet(staging)
          // extract the sentinel partition into a doclen delta, then
          // publish only the real posting buckets
          if (!legacyLen) {
            val lstaging = s"$indexDir/_stage_doclen_$batchId"
            // delta files must match the base doclen layout (raw
            // sentinel layouts read (docId, tf) via readDoclen)
            val rawBase =
              !spark.read.parquet(s"$indexDir/doclen").columns.contains("len")
            spark.read.parquet(s"$staging/bucket=$tb")
              .select($"docBytes", $"tfBytes")
              .as[(Array[Byte], Array[Byte])]
              .flatMap { case (db, tfb) =>
                VByte.decodeDeltas(db).iterator.zip(VByte.decode(tfb).iterator)
              }
              .toDF("docId", if (rawBase) "tf" else "len")
              .repartition(1)
              .write.mode("overwrite").parquet(lstaging)
            Lineage.publishAppend(spark, lstaging, s"$indexDir/doclen", s"b$batchId")
          }
          val sfs = new org.apache.hadoop.fs.Path(staging)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          sfs.delete(new org.apache.hadoop.fs.Path(s"$staging/bucket=$tb"), true)
          Lineage.publishAppend(spark, staging, s"$indexDir/postings", s"b$batchId")
        }
      }
      Nil
    }

    // dict + stats derive from committed data: recompute (overwrite)
    writeDict(spark, indexDir)
    writeStats(spark, indexDir, cfg)
  }

  /** Delete documents by docid: append a lineage-committed tombstone
    * batch (reference DELETE /documents; the on-disk model is
    * Lucene-style live-docs — postings/positions of deleted docs stay
    * until [[compact]], every SearchEngine read path excludes them).
    * Like Lucene, corpus statistics (N, avgdl, df→idf) keep counting
    * tombstoned docs until compaction, so surviving docs' BM25 scores
    * are bit-identical before and after a delete — compaction is the
    * point where statistics converge to the live corpus. Idempotent
    * per batchId. */
  def delete(spark: SparkSession, indexDir: String, ids: Seq[Int],
             batchId: String): Unit = {
    import spark.implicits._
    Lineage.stage(spark, indexDir, s"delete_$batchId") {
      ids.toDF("docId").repartition(1)
        .write.mode("overwrite").parquet(s"$indexDir/deleted/batch=d$batchId")
      Nil
    }
  }

  /** Persisted per-column facet value index (reference U4, the facet
    * LEVEL TREE `facet/facet_*.rs`: level-0 leaves are (value → docid
    * bitmap), upper levels aggregate value RANGES so a range query
    * touches O(log) groups). Columnar re-expression: one tiny
    * (value, n, docidMin, docidMax) row per distinct facet value,
    * range-partitioned and sorted BY VALUE — a range predicate prunes
    * parquet row groups via min/max stats, so range counts and
    * distributions read O(matching values) rows and never touch the
    * doc store. The upper tree levels are exactly what parquet row-
    * group statistics provide for free over a value-sorted file.
    * A STATISTICS TABLE over the LIVE documents at build time: every
    * invocation rebuilds it (idempotent overwrite — one tiny
    * aggregation), so call it again after append/delete batches;
    * tombstoned docs are excluded, so facet counts agree with
    * `SearchEngine.docs` exactly (N/avgdl keep Lucene tombstone
    * semantics until compact; facet counts do not need to, and the
    * skip-if-committed lineage pattern would silently freeze them at
    * their first build). */
  def buildFacetIndex(spark: SparkSession, indexDir: String,
                      cols: Seq[String], numPartitions: Int = 4): Unit = {
    import spark.implicits._
    // staleness = the SOURCE tables changed (docs/doclen/deleted): a
    // driver-side file-listing fingerprint decides, costing zero Spark
    // jobs — a repeated call over an unchanged index (every resumed
    // import / cached-engine path) must not pay the full rebuild it
    // exists to keep consistent. Fingerprint marker written AFTER the
    // data (killed rebuild re-runs); append/delete change the listing,
    // so the rebuild-on-change contract above is preserved exactly.
    val sig = dirFingerprint(spark, Seq(s"$indexDir/docs",
      s"$indexDir/doclen", s"$indexDir/deleted")) + s":$numPartitions"
    val stale = cols.filterNot(c =>
      readMarker(spark, s"$indexDir/facets/$c/$FprFile").contains(sig))
    if (stale.isEmpty) return
    val live =
      if (stale.contains("len")) liveDocsWithLen(spark, indexDir)
      else liveDocs(spark, indexDir)
    stale.foreach { c =>
      live.groupBy(col(c).as("value"))
        .agg(count(lit(1)).as("n"),
          min($"docId").as("docidMin"), max($"docId").as("docidMax"))
        .repartitionByRange(numPartitions, $"value")
        .sortWithinPartitions($"value")
        .write.mode("overwrite").parquet(s"$indexDir/facets/$c")
      writeMarker(spark, s"$indexDir/facets/$c/$FprFile", sig)
    }
  }

  /** Underscore-prefixed so parquet readers ignore it as metadata. */
  private final val FprFile = "_FINGERPRINT"

  /** Driver-side fingerprint of table directories — recursive (path,
    * length, mtime) listing, hashed. No Spark job: a staleness check
    * must cost less than the rebuild it avoids. */
  private def dirFingerprint(spark: SparkSession, dirs: Seq[String]): String = {
    val sb = new StringBuilder
    dirs.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) {
        val it = fs.listFiles(p, true)
        val entries = ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next()
          val name = f.getPath.toUri.getPath
          if (!name.endsWith(FprFile))
            entries += s"$name:${f.getLen}:${f.getModificationTime}"
        }
        entries.sorted.foreach(e => sb.append(e).append('\n'))
      }
    }
    Sha.hex(sb.toString)
  }

  private def readMarker(spark: SparkSession, path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

  private def writeMarker(spark: SparkSession, path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Precomputed prefix posting tables (reference U3: the index
    * materializes `word_prefix_docids` for prefixes of length ≤ 4
    * occurring often enough — index.rs:129-132, thresholds at
    * index.rs:1711-1713 (≥100 docs, len ≤ 4), builder
    * update/new/words_prefix_docids.rs — so search-as-you-type never
    * expands a short prefix on the fly).
    *
    * Spark re-expression, three tables under `indexDir`:
    *   prefix_dict/       (term=prefix, df=Σ member df, len) — the
    *                      selection set; TermDict-compatible schema
    *   prefixes/bucket=B/ merged posting blocks keyed by the prefix
    *                      (same EncodedCols layout as postings/, so the
    *                      query-side decode path is shared verbatim)
    *   prefix_positions/bucket=B/  merged position arrays per
    *                      (prefix, docId) — the reference's
    *                      word_prefix_position_docids analogue, feeding
    *                      proximity/attribute ranks for prefix slots
    *
    * Selection uses Σdf ≥ minDf (an upper bound of the reference's
    * distinct-doc threshold — cheap from the dict alone; a prefix
    * passing on Σdf but not on distinct docs merely materializes a
    * slightly-smaller-than-threshold list).
    *
    * Staleness: NOT lineage-gated (that would freeze the tables at
    * their first build — the trap buildFacetIndex documents). Instead a
    * fingerprint of the posting metadata (Σcount, max lastDoc, #blocks
    * — a column-pruned scan) is stored in prefix_meta/; a rerun after
    * append/compact sees a changed fingerprint and rebuilds, while a
    * rerun over unchanged postings is a cheap no-op. The meta is
    * written LAST, so a killed rebuild re-runs (idempotent overwrite).
    * One decode pass over the posting blocks + one bounded shuffle per
    * table — never per query. */
  def buildPrefixIndex(spark: SparkSession, indexDir: String, cfg: IndexConfig,
                       maxLen: Int = PrefixMaxLen, minDf: Long = PrefixMinDf): Unit = {
    import spark.implicits._
    // staleness fingerprint from the postings FILE LISTING, not an
    // aggregation over the block metadata: same trigger surface (any
    // append/compact rewrites posting files), but the check is pure
    // driver-side FS listing — the previous agg sig cost a Spark job +
    // a prefix_meta read per call even when nothing changed
    val sig = dirFingerprint(spark, Seq(s"$indexDir/postings")) +
      s":$maxLen:$minDf"
    if (readMarker(spark, s"$indexDir/prefix_meta/$FprFile").contains(sig)) return

    spark.read.parquet(s"$indexDir/dict")
      .select($"term", $"df").as[(String, Long)]
      .flatMap { case (t, df) =>
        (1 to math.min(maxLen, t.length)).map(l => (t.substring(0, l), df))
      }
      .toDF("term", "df")
      .groupBy($"term").agg(sum($"df").as("df"))
      .filter($"df" >= minDf)
      .select($"term", $"df", length($"term").as("len"))
      .write.mode("overwrite").parquet(s"$indexDir/prefix_dict")

    val sel = spark.read.parquet(s"$indexDir/prefix_dict").select($"term".as("prefix"))

    // merged prefix postings: decode → explode member prefixes → keep
    // selected → re-encode through the standard (term, key) shuffle
    // (same salt, same block layout)
    encodeBlocks(
      spark.read.parquet(s"$indexDir/postings")
        .select($"term", $"docBytes", $"tfBytes")
        .as[(String, Array[Byte], Array[Byte])]
        .flatMap { case (t, db, tfb) =>
          val ids = VByte.decodeDeltas(db); val tfs = VByte.decode(tfb)
          (1 to math.min(maxLen, t.length)).iterator.flatMap { l =>
            val p = t.substring(0, l)
            ids.iterator.zip(tfs.iterator).map { case (d, tf) => (p, d, tf) }
          }
        }
        .toDF("prefix", "docId", "tf")
        .join(sel, Seq("prefix"), "left_semi")
        .groupBy($"prefix", $"docId").agg(sum($"tf").cast("int").as("tf"))
        .select($"prefix".as("term"), packKeyCol($"docId", $"tf").as("key")),
      cfg)
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexDir/prefixes")

    // merged prefix positions (only when the index has positions)
    val tb = cfg.termBuckets
    val posP = new org.apache.hadoop.fs.Path(s"$indexDir/positions")
    if (posP.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(posP)) {
      spark.read.parquet(s"$indexDir/positions")
        .select($"term", $"docId", $"positions")
        .as[(String, Int, Array[Int])]
        .flatMap { case (t, d, ps) =>
          (1 to math.min(maxLen, t.length)).map(l => (t.substring(0, l), d, ps))
        }
        .toDF("prefix", "docId", "positions")
        .join(sel, Seq("prefix"), "left_semi")
        .groupBy($"prefix", $"docId")
        .agg(sort_array(array_distinct(flatten(collect_list($"positions"))))
          .as("positions"))
        .select($"prefix".as("term"), $"docId", $"positions")
        .as[(String, Int, Array[Int])]
        .map { case (t, d, ps) => (t, d, ps, bucketOf(t, tb)) }
        .toDF("term", "docId", "positions", "bucket")
        .repartition(math.max(1, cfg.numPartitions / 2), $"term")
        .sortWithinPartitions($"term", $"docId")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$indexDir/prefix_positions")
    }
    // marker LAST (killed rebuild re-runs); plain file, no Spark job
    writeMarker(spark, s"$indexDir/prefix_meta/$FprFile", sig)
  }

  /** Reference thresholds (index.rs:1711-1713). */
  final val PrefixMaxLen = 4
  final val PrefixMinDf = 100L

  /** Rewrite the index without tombstoned documents: rebuild through
    * the standard pipeline from the live doc store (bounded tombstone
    * model: delete() is O(batch), compact() is the amortized rewrite —
    * at 10^12 files it is a full parallel re-index, run it when the
    * tombstone fraction justifies reclaiming scan/skip efficiency). */
  def compact(spark: SparkSession, indexDir: String, outDir: String,
              cfg: IndexConfig): Unit = {
    import spark.implicits._
    val live = liveDocs(spark, indexDir)
    build(spark, live.select($"repo", $"path", $"commit", $"lang", $"content")
      .as[graft.corpus.SourceFile], outDir, cfg)
  }

  /** stats table: one scan of the narrow doclen table. Tombstoned docs
    * stay counted (Lucene semantics — see [[delete]]); [[compact]] is
    * where statistics shrink to live. */
  private def writeStats(spark: SparkSession, indexDir: String,
                         cfg: IndexConfig): Unit = {
    import spark.implicits._
    // avgdl from the doclen table, NOT from dict cf sums: with stop
    // words the dictionary undercounts tokens while `len` (the BM25
    // norm) counts them all — avgdl must match len's definition or
    // norms skew. Pre-doclen (v7) layouts keep len in docs/.
    val lenDf = {
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/doclen")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) readDoclen(spark, indexDir)
      else spark.read.parquet(s"$indexDir/docs")
    }
    val row = lenDf.select($"len")
      .agg(count(lit(1)), coalesce(sum($"len"), lit(0L))).collect()(0)
    val n = row.getLong(0)
    val tokens = row.getLong(1)
    val avgdl = if (n == 0) 0.0 else tokens.toDouble / n
    Seq(("N", n.toDouble), ("avgdl", avgdl), ("k1", BM25.K1), ("b", BM25.B),
      ("docsPerShard", cfg.docsPerShard.toDouble),
      ("termBuckets", cfg.termBuckets.toDouble),
      ("blockSize", cfg.blockSize.toDouble),
      // pin the normalizer folds the stored terms went through — the
      // engine fails fast on a version mismatch instead of silently
      // missing affected words (Tokenizer.NormalizerVersion)
      ("normalizerVersion", Tokenizer.NormalizerVersion.toDouble))
      .toDF("key", "value")
      .repartition(1).write.mode("overwrite").parquet(s"$indexDir/stats")
    // persist the tokenizer settings (same contract as stop words: the
    // query side loads them from the index, so both ends segment
    // identically by construction)
    if (!cfg.tokenizer.isDefault) {
      val t = cfg.tokenizer
      // separators mix single-char and multi-char entries in ONE string
      // column; the reader routes by length (charabia's model: they are
      // all just string tokens)
      Seq(((t.separatorTokens.map(_.toString) ++ t.separatorStrings).toSeq.sorted,
          t.nonSeparatorTokens.toSeq.map(_.toString).sorted,
          t.dictionary.toSeq.sorted,
          t.localesByFid.toSeq.sorted.map { case (fid, loc) => s"$fid:$loc" },
          // index-LEVEL CJK unigram override ("" = autodetect): must
          // roundtrip or the query side would segment CJK differently
          // from the index
          t.cjkUnigrams.fold("")(_.toString)))
        .toDF("separators", "nonSeparators", "dictionary", "locales",
          "cjkUnigrams")
        .repartition(1).write.mode("overwrite").parquet(s"$indexDir/tokenizer")
    }
  }

  /** Update-merge ingest (reference S1 replace vs update semantics,
    * document_operation.rs): keep the latest version per primary key
    * before indexing. */
  def latestByKey(df: DataFrame, pkCols: Seq[String], versionCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pkCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /** Build over rows that already carry a dense docid (e.g. an external
    * table with an integer primary key). */
  def buildFromTable(spark: SparkSession, df: DataFrame,
                     docIdCol: String, contentCol: String, langCol: String,
                     sourceCol: String, indexDir: String,
                     cfg: IndexConfig): Unit = {
    import spark.implicits._
    // reuse the main pipeline with the PK forced to the existing id:
    // sorting by (repo="", path=zero-padded id) reproduces id order,
    // but simpler and exact: write docs directly, then run the shared
    // post-docs stages. To keep one code path we pre-commit the docs
    // stage here.
    Lineage.stage(spark, indexDir, "docs") {
      // pure-column projection (sha2 is codegen'd and equals Sha.hex:
      // both are lowercase-hex SHA-256 of the UTF-8 bytes); no tokenize
      // here — the shared post-docs stages do the single tokenize pass
      df.select(
          col(docIdCol).cast("int").as("docId"),
          col(sourceCol).cast("string").as("repo"),
          col(docIdCol).cast("string").as("path"),
          lit("").as("commit"),
          col(langCol).cast("string").as("lang"),
          col(contentCol).cast("string").as("content"))
        .withColumn("content_sha256", sha2($"content", 256))
        .write.mode("overwrite").parquet(s"$indexDir/docs")
      lineageOf(spark, s"$indexDir/docs", "docId")
    }
    buildFromDocs(spark, indexDir, cfg)
  }

  /** Multi-field build (reference: positions are
    * `fid << 16 | relative_pos`, lib.rs:201-208; per-field weights feed
    * the fid ranking rule, ranking_rule_graph/fid/mod.rs:50-110).
    *
    * @param fields (columnName, weight) per searchable field, fid =
    *   position in this list; lower weight = more important (reference
    *   weight semantics). Docs store keeps the original field columns
    *   plus `content` = hard-separator-joined concatenation (display,
    *   sha); `len` = total tokens across fields (BM25 norm). tf sums
    *   across fields; positions carry the fid in the high 16 bits, so
    *   phrase/proximity joins stay within a field by construction
    *   (cross-field distances clamp past the 7/8 caps).
    */
  def buildMultiField(spark: SparkSession, df: DataFrame, docIdCol: String,
                      fields: Seq[(String, Int)], langCol: String,
                      sourceCol: String, indexDir: String,
                      cfg: IndexConfig): Unit = {
    import spark.implicits._
    require(fields.nonEmpty && fields.size < (1 << 15), "1..32767 fields")
    val fieldCols = fields.map(_._1)

    Lineage.stage(spark, indexDir, "fields") {
      fields.zipWithIndex.map { case ((name, w), fid) => (fid, name, w) }
        .toDF("fid", "name", "weight")
        .repartition(1).write.mode("overwrite").parquet(s"$indexDir/fields")
      Nil
    }

    Lineage.stage(spark, indexDir, "docs") {
      val concat = concat_ws("\n\n", fieldCols.map(col): _*)
      df.select(
          col(docIdCol).cast("int").as("docId") +:
            col(sourceCol).cast("string").as("repo") +:
            col(docIdCol).cast("string").as("path") +:
            lit("").as("commit") +:
            col(langCol).cast("string").as("lang") +:
            concat.as("content") +:
            fieldCols.map(c => col(c).cast("string").as(c)): _*)
        .withColumn("content_sha256", sha2($"content", 256))
        .write.mode("overwrite").parquet(s"$indexDir/docs")
      lineageOf(spark, s"$indexDir/docs", "docId")
    }
    val docsDf = spark.read.parquet(s"$indexDir/docs")
    val tb = cfg.termBuckets
    val stop = cfg.stopWords
    val tok = cfg.tokenizer

    // ---- the ONE tokenize pass: every field of every doc exactly once.
    // Per-doc grouping is doc-local (no groupBy shuffle); positions carry
    // fid<<16; the sentinel len row counts tokens across ALL fields
    // (including stop words — the BM25 norm). Postings then derive from
    // a narrow (term, docId, tf) scan of the committed positions.
    Lineage.stage(spark, indexDir, "positions") {
      writePositions(
        docsDf
          .select($"docId",
            array(fieldCols.map(c => coalesce(col(c), lit(""))): _*).as("fs"))
          .as[(Int, Seq[String])]
          .flatMap { case (id, fs) => positionRowsOf(id, fs, stop, tok, tb) },
        s"$indexDir/positions", cfg, cfg.numPartitions)
      Nil
    }
    doclenStage(spark, indexDir, cfg, fromPositions = true)

    Lineage.stage(spark, indexDir, "postings") {
      encodeBlocks(
        spark.read.parquet(s"$indexDir/positions")
          .filter($"bucket" =!= tb)
          .select($"term", packKeyCol($"docId", $"tf").as("key")),
        cfg)
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexDir/postings")
      postingLineage(spark, s"$indexDir/postings", "postings")
    }

    Lineage.stage(spark, indexDir, "dict") {
      writeDict(spark, indexDir)
      Nil
    }
    Lineage.stage(spark, indexDir, "stats") {
      writeStats(spark, indexDir, cfg)
      Nil
    }
  }

  /** Streaming block encoder: input (term, packKey(docId, tf)) sorted by
    * (term, key) within the partition — equivalently (term, shard,
    * docId); emits one PostingBlock row (plus bucket) per `blockSize`
    * docids of each (term, shard) run. The single sanctioned imperative
    * spot (SURVEY §4.4). */
  def encodePartition(rows: Iterator[(String, Long)],
                      blockSize: Int, termBuckets: Int, docsPerShard: Int)
      : Iterator[(String, Int, Int, Int, Int, Int, Array[Byte], Array[Byte], Int, Long, Int, Int)] = {
    new Iterator[(String, Int, Int, Int, Int, Int, Array[Byte], Array[Byte], Int, Long, Int, Int)] {
      private val it = rows.buffered
      private var out: Iterator[(String, Int, Int, Int, Int, Int, Array[Byte], Array[Byte], Int, Long, Int, Int)] =
        Iterator.empty
      override def hasNext: Boolean = out.hasNext || it.hasNext
      override def next() = {
        if (!out.hasNext) {
          val term = it.head._1
          val shard = keyDoc(it.head._2) / docsPerShard
          val docIds = new ArrayBuffer[Int](blockSize)
          val tfs = new ArrayBuffer[Int](blockSize)
          while (it.hasNext && it.head._1 == term &&
                 keyDoc(it.head._2) / docsPerShard == shard) {
            val k = it.next()._2; docIds += keyDoc(k); tfs += keyTf(k)
          }
          val bucket = bucketOfIndexed(term, termBuckets)
          out = docIds.grouped(blockSize).zip(tfs.grouped(blockSize))
            .zipWithIndex.map { case ((ds, ts), bid) =>
              val da = ds.toArray; val ta = ts.toArray
              val db = VByte.encodeDeltas(da); val tb = VByte.encode(ta)
              (term, shard, bid, da.head, da.last, da.length, db, tb,
                ta.max, ta.map(_.toLong).sum, db.length + tb.length, bucket)
            }
        }
        out.next()
      }
    }
  }

  val EncodedCols: Seq[String] = Seq("term", "shard", "blockId", "firstDoc",
    "lastDoc", "count", "docBytes", "tfBytes", "blockMaxTf", "tfSum",
    "encBytes", "bucket")

  private def lineageOf(spark: SparkSession, dir: String,
                        docIdCol: String): Seq[LineageRow] = {
    val df = spark.read.parquet(dir)
    val r = df.agg(min(col(docIdCol)), max(col(docIdCol)), count(lit(1))).collect()(0)
    Seq(LineageRow(dir.split('/').last, 0, r.getInt(0), r.getInt(1), r.getLong(2),
      0L, Sha.hex(s"$dir:${r.getLong(2)}"), java.time.Instant.now.toString))
  }

  /** Per-shard lineage from a column-pruned scan of the committed
    * posting metadata (blob columns never read). */
  private def postingLineage(spark: SparkSession, dir: String,
                             stage: String): Seq[LineageRow] = {
    import spark.implicits._
    spark.read.parquet(dir)
      .filter($"term" =!= LenTerm) // lineage describes real postings only
      .select($"shard", $"term", $"firstDoc", $"lastDoc", $"count", $"encBytes")
      .groupBy($"shard").agg(
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

}
