package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.corpus.SourceFile

/** Dump export / import (S5; reference crates/dump — a v6 dump is a
  * tarball of per-index `documents.jsonl` + `settings.json` +
  * metadata). The Spark-first re-expression keeps the same logical
  * layout but as a directory of distributed JSONL part files — at
  * 10^12 documents a dump is a parallel-written dataset, not a single
  * archive stream:
  *
  *   dumpDir/documents/   JSONL, one object per document (all external
  *                        fields + content — everything needed to
  *                        rebuild from scratch)
  *   dumpDir/settings/    one-row JSON: index parameters that affect
  *                        build semantics (termBuckets, blockSize,
  *                        docsPerShard, positions) + stop words
  *
  * Import rebuilds through the standard lineage-committed pipeline, so
  * an interrupted import resumes like any build.
  */
object Dump {

  def exportDump(spark: SparkSession, indexDir: String, dumpDir: String): Unit = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // multi-field indexes flatten to the concatenated content column in
    // this dump format — exporting one would silently lose the field
    // structure on import, so fail fast (reference dumps carry full
    // per-index settings; multi-field dump support is a format v2)
    require(!fs.exists(new Path(s"$indexDir/fields")),
      "exportDump does not support multi-field indexes: the documents.jsonl " +
        "format stores only the concatenated content column")
    // LIVE documents only: a dump taken after delete() but before
    // compact() must not resurrect tombstoned docs on import
    IndexBuild.liveDocs(spark, indexDir)
      .select($"repo", $"path", $"commit", $"lang", $"content")
      .write.mode("overwrite").json(s"$dumpDir/documents")

    val stats = spark.read.parquet(s"$indexDir/stats")
      .as[(String, Double)].collect().toMap
    val stop: Seq[String] =
      if (fs.exists(new Path(s"$indexDir/stopwords")))
        spark.read.parquet(s"$indexDir/stopwords").as[String].collect().toSeq.sorted
      else Nil
    val positions = fs.exists(new Path(s"$indexDir/positions"))
    // facet indexes are derived tables: record their columns so import
    // rebuilds them (the reference dump's settings capture filterable
    // attributes the same way)
    val facetCols: Seq[String] = {
      val fp = new Path(s"$indexDir/facets")
      if (fs.exists(fp)) fs.listStatus(fp).map(_.getPath.getName).toSeq.sorted
      else Nil
    }
    // tokenizer settings travel with the dump (segmentation must match
    // on rebuild or indexed terms change)
    val (seps, nonSeps, tokDict): (Seq[String], Seq[String], Seq[String]) = {
      val tp = new Path(s"$indexDir/tokenizer")
      if (!fs.exists(tp)) (Nil, Nil, Nil)
      else {
        val r = spark.read.parquet(s"$indexDir/tokenizer").collect()(0)
        (r.getAs[scala.collection.Seq[String]]("separators").toSeq,
          r.getAs[scala.collection.Seq[String]]("nonSeparators").toSeq,
          r.getAs[scala.collection.Seq[String]]("dictionary").toSeq)
      }
    }
    Seq((stats("docsPerShard").toInt, stats("termBuckets").toInt,
        stats("blockSize").toInt, positions, stop, facetCols,
        seps, nonSeps, tokDict))
      .toDF("docsPerShard", "termBuckets", "blockSize", "positions",
        "stopWords", "facetColumns", "separatorTokens", "nonSeparatorTokens",
        "tokenizerDictionary")
      .repartition(1).write.mode("overwrite").json(s"$dumpDir/settings")
  }

  /** Rebuild an index from a dump. Settings stored in the dump win;
    * `numPartitions` is execution-level (cluster-size dependent), so it
    * comes from the caller's cfg. */
  def importDump(spark: SparkSession, dumpDir: String, indexDir: String,
                 cfg: IndexConfig = IndexConfig()): Unit = {
    import spark.implicits._
    val st = spark.read.json(s"$dumpDir/settings").collect()(0)
    def strSeq(f: String): Seq[String] =
      if (!st.schema.fieldNames.contains(f)) Nil
      else Option(st.getAs[scala.collection.Seq[String]](f)).fold(Seq.empty[String])(_.toSeq)
    val restored = cfg.copy(
      docsPerShard = st.getAs[Long]("docsPerShard").toInt,
      termBuckets = st.getAs[Long]("termBuckets").toInt,
      blockSize = st.getAs[Long]("blockSize").toInt,
      positions = st.getAs[Boolean]("positions"),
      stopWords = st.getAs[scala.collection.Seq[String]]("stopWords").toSet,
      tokenizer = graft.functions.Tokenizer.TokSettings(
        strSeq("separatorTokens").map(_.charAt(0)).toSet,
        strSeq("nonSeparatorTokens").map(_.charAt(0)).toSet,
        strSeq("tokenizerDictionary").toSet))
    val docs = spark.read.json(s"$dumpDir/documents")
      .select($"repo".cast("string"), $"path".cast("string"),
        $"commit".cast("string"), $"lang".cast("string"),
        $"content".cast("string"))
      .as[SourceFile]
    IndexBuild.build(spark, docs, indexDir, restored)
    // rebuild derived facet indexes recorded in the dump settings
    // (older dumps have no facetColumns field)
    if (st.schema.fieldNames.contains("facetColumns")) {
      val cols = st.getAs[scala.collection.Seq[String]]("facetColumns")
      if (cols != null && cols.nonEmpty)
        IndexBuild.buildFacetIndex(spark, indexDir, cols.toSeq)
    }
  }
}
