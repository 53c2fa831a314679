package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.index.{IndexBuild, IndexConfig}
import graft.search.SearchEngine

/** Round benchmark. Prints ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},
  *    "sf":"...","build_files_per_sec":..., "query_p50_ms":...,
  *    "scaling":{"files_per_sec_8":...,"files_per_sec_32":...,
  *               "efficiency":...}}
  *
  * Scaling efficiency follows BASELINE.md: the same index-build job at
  * local[8] vs local[32] on identical input; efficiency =
  * (throughput@32 / throughput@8) / 4 (sandbox stand-in for N vs 4N
  * executors).
  */
object Bench {

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Index-build throughput for n synthetic files at a given core count
    * (fresh index dir each time). */
  private def buildThroughput(cores: Int, n: Long): Double = {
    val spark = newSession(cores)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-bench-$cores").toString
    val t0 = System.nanoTime()
    val corpus = CorpusGen.generate(spark, n).as[graft.corpus.SourceFile]
    IndexBuild.build(spark, corpus, dir,
      IndexConfig(docsPerShard = 1 << 12, termBuckets = 4,
        blockSize = 128, numPartitions = cores * 2))
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    deleteRec(new java.io.File(dir))
    n / sec
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val buildN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "40000").toLong

    // ---- scaling: same job at 1x and 4x cores --------------------------
    val lowCores = math.max(1, cpus / 4)
    val thrLow = buildThroughput(lowCores, buildN)
    val thrHigh = buildThroughput(cpus, buildN)
    val efficiency = (thrHigh / thrLow) / (cpus.toDouble / lowCores)

    // ---- per-query timings on the driver's sf dir ----------------------
    val spark = newSession(cpus)
    // warm the document index once so query timings measure queries
    DocIndex.engine(spark, sfDir)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // ---- warm top-k latency p50 ----------------------------------------
    val engine = new SearchEngine(spark, DocIndex.indexDir(sfDir))
    val queries = Seq("spark merge", "batch stream window", "data table",
      "key value column", "slow join")
    // warmup
    queries.foreach(q => engine.searchDF(q, 10).collect())
    val lat = (1 to 3).flatMap(_ => queries.map { q =>
      val t0 = System.nanoTime()
      engine.searchDF(q, 10).collect()
      (System.nanoTime() - t0) / 1e6
    }).sorted
    val p50 = lat(lat.length / 2)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
      s""""queries":$qs,"sf":"$sfDir",""" +
      s""""build_files_per_sec":${thrHigh.round},"query_p50_ms":${p50.round},""" +
      s""""scaling":{"cores_low":$lowCores,"cores_high":$cpus,""" +
      f""""files_per_sec_low":${thrLow.round},"files_per_sec_high":${thrHigh.round},"efficiency":$efficiency%.3f}}"""
    println(json)
    spark.stop()
  }
}
