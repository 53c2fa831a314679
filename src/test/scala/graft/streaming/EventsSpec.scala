package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The streaming query must produce exactly the batch aggregation when
  * fed the same files (AvailableNow trigger = bounded stream). */
class EventsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("structured-streaming hourly counts == batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val batch = Events.hourlyCounts(
      spark.read.parquet(s"$dir/events.parquet"))
      .select(
        org.apache.spark.sql.functions.date_format($"hour", "yyyy-MM-dd HH:mm:ss"),
        $"event_type", $"n", $"sum_value")
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2))

    // FileStreamSource requires a directory of files
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("part-0.parquet"))
    val q = Events.hourlyCountsStream(spark, streamDir.toString, "ev_hourly")
    q.awaitTermination(120000)
    val stream = spark.table("ev_hourly")
      .select(
        org.apache.spark.sql.functions.date_format($"hour", "yyyy-MM-dd HH:mm:ss"),
        $"event_type", $"n", $"sum_value")
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2))

    assert(stream.length == batch.length)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s._1 == b._1 && s._2 == b._2 && s._3 == b._3)
      assert(math.abs(s._4 - b._4) < 1e-6)
    }
  }
}
