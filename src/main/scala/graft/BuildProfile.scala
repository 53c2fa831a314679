package graft
import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.index.{IndexBuild, IndexConfig}
object BuildProfile {
  def main(args: Array[String]): Unit = {
    sys.props("graft.build.verbose") = "true"
    val cores = args(0).toInt; val n = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("profile").config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // shuffle/spill codec A/B (SPARK_GRAFT_CODEC=zstd|lz4): with
      // spark.local.dir on tmpfs every shuffle byte is DRAM traffic,
      // so a denser codec trades spare CPU for the contended resource
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "zstd"))
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_PARQUET_CODEC", "snappy"))
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        val wall = (for (s <- i.submissionTime; c <- i.completionTime)
          yield (c - s) / 1000.0).getOrElse(-1.0)
        println(f"STAGE ${i.stageId}%3d tasks=${i.numTasks}%3d wall=$wall%6.1fs " +
          f"run=${m.executorRunTime / 1000.0}%7.1fs cpu=${m.executorCpuTime / 1e9}%7.1fs " +
          f"gc=${m.jvmGCTime / 1000.0}%6.1fs " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB " +
          f"spill=${m.diskBytesSpilled / 1e6}%6.1fMB  ${i.name.take(40)}")
      }
    })
    import spark.implicits._
    // pre-generated corpus parquet (untimed), matching the Bench shape
    val storageOrder = !sys.env.get("SPARK_GRAFT_PROFILE_SORTED").contains("1")
    val cdir = s"/dev/shm/profcorpus-$n"
    if (!new java.io.File(s"$cdir/_SUCCESS").exists())
      CorpusGen.generate(spark, n).write.mode("overwrite").parquet(cdir)
    def corpus = spark.read.parquet(cdir)
      .select($"repo", $"path", $"commit", $"lang", $"content")
      .as[graft.corpus.SourceFile]
    def cfg(np: Int) = IndexConfig(docsPerShard = 1 << 14, termBuckets = 4,
      blockSize = 128, numPartitions = np, storageOrderIds = storageOrder,
      // SPARK_GRAFT_PROFILE_POSITIONS=1: profile the positions-enabled
      // pipeline (cascade-index shape) instead of the bench shape
      positions = sys.env.get("SPARK_GRAFT_PROFILE_POSITIONS").contains("1"),
      // SPARK_GRAFT_CHUNKED=0: row-shuffle A/B arm
      chunkedShuffle = !sys.env.get("SPARK_GRAFT_CHUNKED").contains("0"))
    // warmup build (JIT): small n, separate dir
    val wdir = { new java.io.File("/dev/shm/profidx").mkdirs(); "/dev/shm/profidx/warm" + System.nanoTime() }
    IndexBuild.build(spark, corpus.limit(5000).as[graft.corpus.SourceFile],
      wdir, cfg(cores * 2))
    println("WARMUP done")
    (1 to 2).foreach { r =>
      val dir = "/dev/shm/profidx/main" + System.nanoTime()
      val t0 = System.nanoTime()
      IndexBuild.build(spark, corpus, dir, cfg(cores * 2))
      println(f"TOTAL[$r] ${(System.nanoTime()-t0)/1e9}%.2fs cores=$cores n=$n storageOrder=$storageOrder")
    }
    spark.stop()
  }
}
