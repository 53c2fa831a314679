package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: count Spark jobs/stages and wall time per WARM query — the
  * query latency floor is job-dispatch-bound (~10-30 ms per job in
  * local mode, more under load), so the lever for p50 is fewer jobs
  * per query, not faster tasks. Run:
  *   sbt "runMain graft.QueryJobs [sfDir]"
  */
object QueryJobs {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger()
    val stages = new AtomicInteger()
    val tasks = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
          val d = Option(j.properties)
            .map(_.getProperty("callSite.short", "?")).getOrElse("?")
          println(s"    job ${j.jobId}: $d (${j.stageInfos.size} stages)")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        if (sys.env.contains("SPARK_GRAFT_JOBLOG"))
          println(s"    stage ${s.stageInfo.stageId}: ${s.stageInfo.name} " +
            s"tasks=${s.stageInfo.numTasks}")
      }
    })
    val e = DocIndex.engine(spark, sf)
    val rank = new graft.rank.MeiliRank(e)
    def timed(name: String)(f: => Unit): Unit = {
      f // warm (codegen + shuffle files)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      f
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"$name%-22s ${ms}%7.0f ms  jobs=${jobs.get}%-3d " +
        f"stages=${stages.get}%-3d tasks=${tasks.get}")
    }
    timed("searchDF(and)") { e.searchDF("spark merge", 10).collect(); () }
    timed("searchDF(or)") { e.searchDF("spark OR merge", 10).collect(); () }
    timed("meiliRank") { rank.search("spark merge", 10).collect(); () }
    timed("facetDistribution") {
      e.facetDistribution("spark", "lang").collect(); ()
    }
    timed("phrase") { e.searchDF("\"return value\"", 10).collect(); () }
    spark.stop()
  }
}
