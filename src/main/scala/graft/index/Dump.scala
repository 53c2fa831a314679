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
    spark.read.parquet(s"$indexDir/docs")
      .select($"repo", $"path", $"commit", $"lang", $"content")
      .write.mode("overwrite").json(s"$dumpDir/documents")

    val stats = spark.read.parquet(s"$indexDir/stats")
      .as[(String, Double)].collect().toMap
    val stopP = new org.apache.hadoop.fs.Path(s"$indexDir/stopwords")
    val fs = stopP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stop: Seq[String] =
      if (fs.exists(stopP))
        spark.read.parquet(s"$indexDir/stopwords").as[String].collect().toSeq.sorted
      else Nil
    val positions = fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/positions"))
    Seq((stats("docsPerShard").toInt, stats("termBuckets").toInt,
        stats("blockSize").toInt, positions, stop))
      .toDF("docsPerShard", "termBuckets", "blockSize", "positions", "stopWords")
      .repartition(1).write.mode("overwrite").json(s"$dumpDir/settings")
  }

  /** Rebuild an index from a dump. Settings stored in the dump win;
    * `numPartitions` is execution-level (cluster-size dependent), so it
    * comes from the caller's cfg. */
  def importDump(spark: SparkSession, dumpDir: String, indexDir: String,
                 cfg: IndexConfig = IndexConfig()): Unit = {
    import spark.implicits._
    val st = spark.read.json(s"$dumpDir/settings").collect()(0)
    val restored = cfg.copy(
      docsPerShard = st.getAs[Long]("docsPerShard").toInt,
      termBuckets = st.getAs[Long]("termBuckets").toInt,
      blockSize = st.getAs[Long]("blockSize").toInt,
      positions = st.getAs[Boolean]("positions"),
      stopWords = st.getAs[scala.collection.Seq[String]]("stopWords").toSet)
    val docs = spark.read.json(s"$dumpDir/documents")
      .select($"repo".cast("string"), $"path".cast("string"),
        $"commit".cast("string"), $"lang".cast("string"),
        $"content".cast("string"))
      .as[SourceFile]
    IndexBuild.build(spark, docs, indexDir, restored)
  }
}
