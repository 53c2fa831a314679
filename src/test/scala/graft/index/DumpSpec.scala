package graft.index

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.SparkTestBase
import graft.corpus.SourceFile
import graft.search.SearchEngine

/** Dump export → import roundtrip (S5): the imported index must be
  * query-identical to the original, and the dump must carry the
  * settings that affect build semantics (stop words, positions, layout
  * params). */
class DumpSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def src(i: Int, content: String) =
    SourceFile(s"r${i % 3}", s"p$i.scala", f"c$i%04d", "scala", content)

  test("dump roundtrip: rebuilt index is query-identical, settings survive") {
    val dir = Files.createTempDirectory("dumpSrc").toString
    val dumpDir = Files.createTempDirectory("dump").toString
    val dir2 = Files.createTempDirectory("dumpDst").toString

    val corpus = (0 until 24).map { i =>
      src(i, s"alpha merge the buffer stream ${if (i % 2 == 0) "batchWriter" else "pageCursor"} w$i")
    }.toDS()
    val cfg = IndexConfig(docsPerShard = 8, termBuckets = 2, blockSize = 4,
      numPartitions = 2, positions = true, stopWords = Set("the"))
    IndexBuild.build(spark, corpus, dir, cfg)

    Dump.exportDump(spark, dir, dumpDir)
    // import with a DIFFERENT default cfg: dump settings must win
    Dump.importDump(spark, dumpDir, dir2,
      IndexConfig(docsPerShard = 999, termBuckets = 8, numPartitions = 2))

    val a = new SearchEngine(spark, dir)
    val b = new SearchEngine(spark, dir2)
    assert(b.docs.count() == a.docs.count())
    assert(b.nDocs == a.nDocs && math.abs(b.avgdl - a.avgdl) < 1e-9)
    assert(b.termBuckets == a.termBuckets && b.docsPerShard == a.docsPerShard)
    assert(b.stopWords == Set("the"))
    // dictionary identical
    val da = a.docs.sparkSession.read.parquet(s"$dir/dict")
      .select("term", "df", "cf").as[(String, Long, Long)].collect().toSet
    val db = b.docs.sparkSession.read.parquet(s"$dir2/dict")
      .select("term", "df", "cf").as[(String, Long, Long)].collect().toSet
    assert(da == db)
    // ranked results identical (docids dense-reassigned by the same
    // (repo, path, commit) order, so they line up exactly)
    val qa = a.searchDF("merge buffer", 10).collect().map(r => (r.getInt(0), r.getDouble(1)))
    val qb = b.searchDF("merge buffer", 10).collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(qa.sameElements(qb))
    // positions table rebuilt too: phrase search agrees (and is non-empty)
    val pa = a.phrase(Seq("buffer", "stream")).count()
    assert(pa > 0 && pa == b.phrase(Seq("buffer", "stream")).count())
  }

  test("dump after delete excludes tombstoned docs; facet columns survive") {
    val dir = Files.createTempDirectory("dumpDel").toString
    val dumpDir = Files.createTempDirectory("dumpDel2").toString
    val dir2 = Files.createTempDirectory("dumpDelDst").toString
    val corpus = (0 until 12).map(i => src(i, s"word$i shared merge")).toDS()
    val cfg = IndexConfig(docsPerShard = 8, termBuckets = 2, blockSize = 4,
      numPartitions = 2)
    IndexBuild.build(spark, corpus, dir, cfg)
    IndexBuild.buildFacetIndex(spark, dir, Seq("lang"))
    IndexBuild.delete(spark, dir, Seq(1, 3, 5), "d1")
    Dump.exportDump(spark, dir, dumpDir)
    Dump.importDump(spark, dumpDir, dir2, cfg)
    val a = new SearchEngine(spark, dir)
    val b = new SearchEngine(spark, dir2)
    // the import holds exactly the LIVE docs (no resurrection)
    assert(b.docs.count() == a.docs.count() && b.docs.count() == 9)
    // docids rank by (repo, path): id 1 = p3.scala (r0's second file)
    val pathsA = a.docs.select($"path").as[String].collect().toSet
    val pathsB = b.docs.select($"path").as[String].collect().toSet
    assert(pathsB == pathsA && !pathsB.contains("p3.scala"))
    // facet indexes rebuilt from the dump settings
    assert(b.facetRangeCount("lang",
      org.apache.spark.sql.functions.col("value") === "scala") == 9)
  }

  test("multi-field indexes fail fast on export (format cannot carry fields)") {
    val dir = Files.createTempDirectory("dumpMf").toString
    val df = Seq((0L, "t0", "b0"), (1L, "t1", "b1")).toDF("doc_id", "title", "body")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    IndexBuild.buildMultiField(spark, df, "doc_id",
      fields = Seq(("title", 0), ("body", 1)), langCol = "lang",
      sourceCol = "source", indexDir = dir,
      cfg = IndexConfig(docsPerShard = 4, termBuckets = 2, blockSize = 4,
        numPartitions = 2))
    val ex = intercept[IllegalArgumentException] {
      Dump.exportDump(spark, dir, Files.createTempDirectory("dumpMfOut").toString)
    }
    assert(ex.getMessage.contains("multi-field"))
  }
}
