package graft.index

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import org.apache.hadoop.fs.Path

import graft.SparkTestBase
import graft.corpus.SourceFile
import graft.search.SearchEngine

/** Regression specs for resume-safety of the incremental append path and
  * for WAND conjunctive semantics across shards (ADVICE round 1). */
class ResumeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val cfg = IndexConfig(docsPerShard = 4, termBuckets = 2, blockSize = 4,
    numPartitions = 2, positions = true)

  private def src(i: Int, content: String) =
    SourceFile(s"r$i", s"p$i.scala", f"c$i%04d", "scala", content)

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("append onto a pre-doclen (v7) layout stays on the v7 convention") {
    val dir = Files.createTempDirectory("legacyAppend").toString
    val base = (0 until 8).map(i => src(i, "alpha common words")).toDS()
    IndexBuild.build(spark, base, dir, cfg)
    // convert the index IN PLACE to the v7 layout: len physically in
    // docs/, no doclen/ table (the layout this engine's earlier
    // releases wrote; readers and append must keep supporting it)
    val f = fs(dir)
    val v7docs = spark.read.parquet(s"$dir/docs")
      .join(IndexBuild.readDoclen(spark, dir), Seq("docId"))
    val tmp = s"$dir/_v7docs"
    v7docs.write.mode("overwrite").parquet(tmp)
    f.delete(new Path(s"$dir/docs"), true)
    f.rename(new Path(tmp), new Path(s"$dir/docs"))
    f.delete(new Path(s"$dir/doclen"), true)

    val delta = (8 until 12).map(i => src(i, "zulu unique delta")).toDS()
    IndexBuild.append(spark, delta, dir, cfg, "b1")

    // still v7: no partial doclen/ table was created
    assert(!f.exists(new Path(s"$dir/doclen")),
      "append must not create a delta-only doclen on a v7 index")
    val e = new graft.search.SearchEngine(spark, dir)
    // every doc (base + delta) has a physical len and is searchable
    val lens = e.docs.select($"docId", $"len").as[(Int, Int)].collect().toMap
    assert(lens.keySet == (0 until 12).toSet && lens.values.forall(_ > 0), s"$lens")
    assert(e.searchDF("zulu", 10).collect().map(_.getInt(0)).toSet == (8 until 12).toSet)
    assert(e.searchDF("alpha", 10).collect().map(_.getInt(0)).toSet == (0 until 8).toSet)
    // stats derived through the v7 fallback: N counts all docs
    assert(e.nDocs == 12)
  }

  test("append resume after kill between stages indexes the delta docs") {
    val dir = Files.createTempDirectory("resumeA").toString
    val base = (0 until 8).map(i => src(i, "alpha common words")).toDS()
    val delta = (8 until 12).map(i => src(i, "zulu unique delta")).toDS()
    IndexBuild.build(spark, base, dir, cfg)
    IndexBuild.append(spark, delta, dir, cfg, "b1")

    // simulate a kill AFTER docs_delta committed but BEFORE
    // postings_delta committed: drop the postings commit marker and the
    // published delta posting files (the write never finished)
    val f = fs(dir)
    f.delete(Lineage.markerPath(dir, "postings_delta_b1"), false)
    (0 until cfg.termBuckets).foreach { b =>
      val d = new Path(s"$dir/postings/bucket=$b")
      if (f.exists(d)) f.listStatus(d).map(_.getPath)
        .filter(_.getName.startsWith("bb1-"))
        .foreach(p => f.delete(p, false))
    }

    // resumed append must NOT recompute base=max(docId)+1 (which now
    // includes the committed delta docs and would index nothing)
    IndexBuild.append(spark, delta, dir, cfg, "b1")
    val e = new SearchEngine(spark, dir)
    assert(e.docs.count() == 12, "docs not duplicated by resume")
    assert(e.nDocs == 12, "stats N reflects all docs")
    val hits = e.searchDF("zulu", 10).collect()
    assert(hits.length == 4, s"delta term must be searchable after resume, got ${hits.length}")
  }

  test("append resume after kill between publish and commit does not duplicate") {
    val dir = Files.createTempDirectory("resumeB").toString
    val base = (0 until 8).map(i => src(i, "alpha common words")).toDS()
    val delta = (8 until 12).map(i => src(i, "zulu unique delta")).toDS()
    IndexBuild.build(spark, base, dir, cfg)
    IndexBuild.append(spark, delta, dir, cfg, "b1")

    // simulate a kill AFTER the posting publish but BEFORE the lineage
    // commit: published files present, marker missing
    fs(dir).delete(Lineage.markerPath(dir, "postings_delta_b1"), false)
    IndexBuild.append(spark, delta, dir, cfg, "b1")

    val e = new SearchEngine(spark, dir)
    assert(e.dict("zulu") == 4, "delta term df counted exactly once")
    assert(e.searchDF("zulu", 10).collect().length == 4)
  }

  test("WAND conjunctive returns empty for shards missing a query term") {
    val dir = Files.createTempDirectory("wandShard").toString
    // docsPerShard=4: shard 0 = docs 0-3 (has beta), shard 1 = docs 4-7
    // (alpha only) — pre-fix, shard 1 padded results with alpha-only docs
    val docs = ((0 until 1).map(i => src(i, "alpha beta")) ++
      (1 until 8).map(i => src(i, "alpha only here"))).toDS()
    IndexBuild.build(spark, docs, dir, cfg)
    val e = new SearchEngine(spark, dir)
    val viaDf = e.searchDF("alpha beta", 10).as[(Int, Double)].collect().toSeq
    val viaWand = e.searchWand("alpha beta", 10).as[(Int, Double)].collect().toSeq
    assert(viaDf.map(_._1) == Seq(0))
    assert(viaWand.map(_._1) == viaDf.map(_._1),
      s"WAND must not pad with docs missing a term: $viaWand")
  }
}
