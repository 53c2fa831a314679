package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.index.{IndexBuild, IndexConfig, Lineage}
import graft.search.{Highlighter, SearchEngine}

/** spark-submit demo entry: generate a corpus, build the inverted index
  * (resumable, lineage-tracked), run a few BM25 searches both ways.
  *
  * Usage: runMain graft.Main [nDocs] [indexDir] [query...]
  */
object Main {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(2000L)
    val indexDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-index").toString)
    val query = if (args.length > 2) args.drop(2).mkString(" ") else "merge buffer"

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    println(s"== building index over $nDocs synthetic source files -> $indexDir")
    val t0 = System.nanoTime()
    val corpus = CorpusGen.generate(spark, nDocs).as[graft.corpus.SourceFile]
    IndexBuild.build(spark, corpus, indexDir,
      graft.index.IndexConfig(positions = true))
    val buildSec = (System.nanoTime() - t0) / 1e9
    println(f"== index built in $buildSec%.1f s (${nDocs / buildSec}%.0f files/sec)")

    println("== lineage (committed segments):")
    Lineage.read(spark, indexDir).orderBy("stage", "partitionId").show(20, false)

    val engine = new SearchEngine(spark, indexDir)
    println(s"== query: '$query' (AND, declarative plan)")
    engine.searchHits(query, 10).show(false)
    println(s"== query: '$query' (OR, block-max WAND)")
    engine.searchWand(query, 10, conjunctive = false).show(false)
    println(s"== query with filter: lang = scala")
    engine.searchHits(query, 10, Some("lang = scala")).show(false)

    println(s"== pagination: page 2 of 3-per-page, totalHits")
    val (page2, total) = engine.searchPage(query, 3, 3)
    println(s"totalHits=$total page2=${page2.mkString(", ")}")

    println(s"== highlighted + cropped top hit")
    val topDoc = engine.searchHits(query, 1).select("docId").first().getInt(0)
    val content = engine.docs.filter(s"docId = $topDoc")
      .select("content").first().getString(0)
    val terms = graft.functions.Tokenizer.terms(query).toSet
    println(Highlighter.crop(Highlighter.highlight(content, terms), terms, 16))

    println(s"== Meilisearch rule-cascade ranking (top 5)")
    new graft.rank.MeiliRank(engine).search(query, 5).show(false)

    println(s"== incremental append: +200 docs, re-query")
    import spark.implicits._
    val delta = graft.corpus.CorpusGen.generate(spark, 200, seed = 777L)
      .as[graft.corpus.SourceFile]
    graft.index.IndexBuild.append(spark, delta, indexDir,
      graft.index.IndexConfig(positions = true), s"demo${System.currentTimeMillis()}")
    val engine2 = new SearchEngine(spark, indexDir)
    println(s"docs now: ${engine2.docs.count()}")
    engine2.searchHits(query, 5).show(false)

    spark.stop()
  }
}
