package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1) — NOT the driver
  * bench (Bench.scala is frozen). Per declared query it reports warm
  * wall time, Spark job / stage / task counts, and optionally writes
  * `.explain("formatted")` to a plans dir. Run:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchExtra [plansDir]"
  *
  * Methodology matches the frozen bench's query phase exactly (same
  * session confs, same warm-then-timed `.count()` action) so numbers
  * are comparable; the job/stage counters are the extra signal the
  * frozen bench cannot print.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val plansDir = args.headOption
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.io.compression.codec", "zstd")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger()
    val stages = new AtomicInteger()
    val tasks = new AtomicInteger()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val joblog = sys.env.contains("SPARK_GRAFT_JOBLOG")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (joblog) {
          val d = Option(j.properties)
            .map(_.getProperty("callSite.short", "?")).getOrElse("?")
          jobStart.put(j.jobId, (System.nanoTime(), d)): Unit
        }
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (joblog) Option(jobStart.remove(e.jobId)).foreach { case (t0, d) =>
          println(f"      job ${e.jobId}%-4d ${(System.nanoTime() - t0) / 1e3}%9.0f us  $d")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks): Unit
      }
    })
    DocIndex.engine(spark, sfDir)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warm pass (codegen + side indexes), identical to the frozen bench
    qs.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count(): Unit } catch { case _: Throwable => () }
    }
    var total = 0.0
    val rows = qs.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[extra] $name FAILED: ${e.getMessage}"); false
      }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      if (ok) total += sec
      println(f"$name%-24s ${sec}%7.3f s  jobs=${jobs.get}%-4d " +
        f"stages=${stages.get}%-4d tasks=${tasks.get}")
      (name, sec, jobs.get, stages.get, tasks.get)
    }
    println(f"TOTAL ${total}%.3f s over ${rows.size} queries; " +
      f"p50 ${rows.map(_._2).sorted.apply(rows.size / 2) * 1000}%.0f ms")
    plansDir.foreach { pd =>
      new java.io.File(pd).mkdirs()
      qs.foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$pd/$name.txt")
          w.write(plan); w.close()
        } catch { case e: Throwable =>
          System.err.println(s"[extra] explain $name failed: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
