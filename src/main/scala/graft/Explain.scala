package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump physical plans of the hot queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = DocIndex.engine(spark, "/root/testdata/sf0.001")
    println("===== blocksFor (posting scan) =====")
    e.blocksFor(e.analyze("spark merge")).explain("formatted")
    println("===== searchDF =====")
    e.searchDF("spark merge", 10).explain("formatted")
    spark.stop()
  }
}
