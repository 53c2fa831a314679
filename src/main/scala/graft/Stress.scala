package graft
import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.index.{IndexBuild, IndexConfig}
import graft.search.SearchEngine

/** One-off stress probe: full build + queries at 4x the bench size. */
object Stress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 16000000L
    val shm = new java.io.File("/dev/shm/graft-stress"); shm.mkdirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", shm.getAbsolutePath)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = s"/dev/shm/graft-stress/idx-$n"
    val cfg = IndexConfig(docsPerShard = 1 << 15, termBuckets = 8,
      blockSize = 128, numPartitions = 64)
    val t0 = System.nanoTime()
    IndexBuild.build(spark, CorpusGen.generate(spark, n).as[graft.corpus.SourceFile], dir, cfg)
    val buildSec = (System.nanoTime() - t0) / 1e9
    println(f"STRESS build n=$n wall=$buildSec%.1fs thr=${n / buildSec}%.0f files/s")
    val e = new SearchEngine(spark, dir)
    for (q <- Seq("spark merge", "return buffer", "batch stream window")) {
      val t1 = System.nanoTime()
      val hits = e.search(q, 10).collect()
      println(f"STRESS query '$q' wall=${(System.nanoTime() - t1) / 1e9}%.2fs hits=${hits.length} top=${hits.headOption}")
    }
    val t2 = System.nanoTime()
    val w = e.searchWand("return import", 10).collect()
    println(f"STRESS wand 'return import' wall=${(System.nanoTime() - t2) / 1e9}%.2fs hits=${w.length}")
    def rec(f: java.io.File): Unit = { if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rec)); f.delete(): Unit }
    spark.stop(); rec(new java.io.File(dir))
  }
}
