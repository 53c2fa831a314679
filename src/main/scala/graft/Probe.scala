package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.CorpusGen
import graft.index.IndexBuild

/** Scaling bisection probe (dev tool): times each phase of the postings
  * pipeline separately at a given core count. */
object Probe {
  def main(args: Array[String]): Unit = {
    if (args(0) == "enc") { encBench(); return }
    val cores = args(0).toInt; val n = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("probe").config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo; val m = i.taskMetrics
        println(f"STAGE ${i.stageId}%3d tasks=${i.numTasks}%3d " +
          f"run=${m.executorRunTime / 1000.0}%7.1fs cpu=${m.executorCpuTime / 1e9}%7.1fs " +
          f"gc=${m.jvmGCTime / 1000.0}%6.1fs deser=${m.executorDeserializeTime / 1000.0}%5.1fs " +
          f"shR=${m.shuffleReadMetrics.localBytesRead / 1e6 + m.shuffleReadMetrics.remoteBytesRead / 1e6}%7.1fMB " +
          f"spill=${m.diskBytesSpilled / 1e6}%6.1fMB")
      }
    })
    import spark.implicits._
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $tag%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    val dir = java.nio.file.Files.createTempDirectory("probe").toString
    val corpus = CorpusGen.generate(spark, n).as[graft.corpus.SourceFile]
    time("gen+count")(corpus.count())
    time("gen+sha+write") {
      corpus.map(f => (f.repo, f.path, graft.index.Sha.hex(f.content), f.content))
        .write.mode("overwrite").parquet(s"$dir/docs0")
    }
    val docs = spark.read.parquet(s"$dir/docs0")
      .toDF("repo", "path", "sha", "content")
      .withColumn("docId", pmod(monotonically_increasing_id(), lit(2000000000L)).cast("int"))
    time("tokenize+count") {
      docs.select($"docId", $"content").as[(Int, String)]
        .flatMap { case (i, c) => IndexBuild.termDocsOf(i, c) }.count()
    }
    val dps = 4096
    val shardDiv = s"key div CAST(${dps.toLong << 32} AS BIGINT)"
    val tds = docs.select($"docId", $"content").as[(Int, String)]
      .flatMap { case (i, c) =>
        IndexBuild.termDocsOf(i, c).map(td => (td.term, IndexBuild.packKey(td.docId, td.tf)))
      }
      .toDF("term", "key")
    time("tok+shuffle+sort") {
      tds.repartition(cores * 2, $"term", expr(shardDiv))
        .sortWithinPartitions($"term", $"key").count()
    }
    time("tok+shuf+sort+enc") {
      tds.repartition(cores * 2, $"term", expr(shardDiv))
        .sortWithinPartitions($"term", $"key")
        .as[(String, Long)]
        .mapPartitions(r => IndexBuild.encodePartition(r, 128, 4, dps)).count()
    }
    time("full+write") {
      tds.repartition(cores * 2, $"term", expr(shardDiv))
        .sortWithinPartitions($"term", $"key")
        .as[(String, Long)]
        .mapPartitions(r => IndexBuild.encodePartition(r, 128, 4, dps))
        .toDF(IndexBuild.EncodedCols: _*)
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/post")
    }
    spark.stop()
  }

  /** single-threaded encoder microbench, no Spark */
  def encBench(): Unit = {
    val data = (for {
      t <- (0 until 150).iterator
      s <- (0 until 25).iterator
      d <- (0 until 600).iterator
    } yield (s"term$t", IndexBuild.packKey(s * 100000 + d, 1 + (d % 5)))).toArray
    println(s"${data.length} rows")
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val n = IndexBuild.encodePartition(data.iterator, 128, 4, 100000).size
      println(f"encode: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $n blocks")
    }
  }
}
