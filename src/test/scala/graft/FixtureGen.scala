package graft

import java.nio.file.{Files, Paths}

import graft.corpus.CorpusGen
import graft.search.BruteForce

/** Golden-fixture generator (FIXTURES.md §3): computes expected
  * (docids, scores, totalHits) for the fixture query set with the
  * independent in-memory BruteForce reference — NOT the engine — and
  * writes them as JSON lines under src/test/resources/fixtures/.
  * Run once via `sbt "Test/runMain graft.FixtureGen"` and commit the
  * output; FixtureSpec then pins the engine to these files.
  */
object FixtureGen {
  final val NDocs = 400
  final val Seed = 42L

  final case class Fx(name: String, q: String, conjunctive: Boolean,
                      limit: Int, filterLang: Option[String])

  val fixtures: Seq[Fx] = Seq(
    Fx("single-term", "merge", true, 10, None),
    Fx("two-term-and", "parse buffer", true, 10, None),
    Fx("three-term-and", "encode decode pack", true, 10, None),
    Fx("two-term-or", "flush cursor", false, 10, None),
    Fx("skewed-stop-term", "return import", true, 10, None),
    Fx("filter-and-search", "merge buffer", true, 10, Some("scala")),
    Fx("filter-or-search", "scan segment", false, 10, Some("rust")),
    Fx("single-rare", "pack", true, 10, None),
    Fx("empty-result", "doesnotexist", true, 10, None),
    Fx("big-k", "read write", false, 50, None))

  def brute(spark: org.apache.spark.sql.SparkSession): BruteForce = {
    val rows = CorpusGen.generate(spark, NDocs, Seed)
      .select("repo", "path", "commit", "lang", "content").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
      .sortBy(t => (t._1, t._2, t._3))
    new BruteForce(rows.map(_._5), rows.map(_._4))
  }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bf = brute(spark)
    val outDir = Paths.get("src/test/resources/fixtures")
    Files.createDirectories(outDir)
    val lines = fixtures.map { fx =>
      val hits = bf.topK(fx.q, fx.limit, fx.conjunctive, fx.filterLang)
      val total = bf.topK(fx.q, Int.MaxValue, fx.conjunctive, fx.filterLang).size
      val ids = hits.map(_._1).mkString("[", ",", "]")
      val scores = hits.map(h => f"${h._2}%.9f").mkString("[", ",", "]")
      s"""{"name":"${fx.name}","q":"${fx.q}","conjunctive":${fx.conjunctive},""" +
        s""""limit":${fx.limit},"filterLang":${fx.filterLang.map(l => s""""$l"""").getOrElse("null")},""" +
        s""""docids":$ids,"scores":$scores,"totalHits":$total}"""
    }
    Files.writeString(outDir.resolve("bm25_fixtures.json"),
      lines.mkString("", "\n", "\n"))
    println(s"wrote ${lines.size} fixtures")
    spark.stop()
  }
}
