package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SparkShuf {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val b = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
    val spark = (if (args.length > 1 && args(1) == "shm")
      b.config("spark.local.dir", "/dev/shm/spark-tmp") else b).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"SHUF $tag%-14s ${(System.nanoTime()-t0)/1e9}%7.2fs cores=$cores")
    }
    val df = spark.range(20000000L).select($"id",
      (rand(7) * 1000).cast("int").as("k"),
      concat(lit("termstring_"), ($"id" % 97).cast("string")).as("t"))
    time("warm")(df.count())
    time("shuffle+sort") {
      df.repartition(cores * 2, $"t", $"k")
        .sortWithinPartitions($"t", $"k", $"id").count()
    }
    spark.stop()
  }
}
