package graft.index

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.SparkTestBase
import graft.corpus.SourceFile
import graft.search.SearchEngine

/** Storage-order docid assignment (IndexConfig.storageOrderIds): ids
  * follow (file path, row index) with ZERO corpus shuffle; retrieval is
  * id-permutation-equivalent to the sorted build. */
class StorageOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val cfg = IndexConfig(docsPerShard = 8, termBuckets = 2, blockSize = 4,
    numPartitions = 2, positions = true)

  private def corpus(n: Int): Seq[SourceFile] =
    (0 until n).map(i => SourceFile(s"r${i % 3}", s"p$i.scala", f"c$i%04d",
      "scala", s"alpha beta w$i gamma ${if (i % 2 == 0) "even split" else "odd merge"}"))

  test("storage-order build: dense deterministic ids, no corpus shuffle, same retrieval") {
    val cdir = Files.createTempDirectory("soCorpus").toString
    corpus(40).toDS().repartition(3).write.mode("overwrite").parquet(cdir)
    val fileSrc = spark.read.parquet(cdir).as[SourceFile]

    val dirA = Files.createTempDirectory("soIdxA").toString
    IndexBuild.build(spark, fileSrc, dirA, cfg.copy(storageOrderIds = true))
    val dirB = Files.createTempDirectory("soIdxB").toString
    IndexBuild.build(spark, fileSrc, dirB, cfg) // sorted baseline

    val a = new SearchEngine(spark, dirA)
    val b = new SearchEngine(spark, dirB)

    // dense 0..N-1 ids on both; storage order = (file, row) order
    val idsA = a.docs.select($"docId").as[Int].collect().sorted
    assert(idsA.toSeq == (0 until 40))

    // ids are deterministic: rebuilding from the same files reproduces
    // the exact (docId -> path) mapping
    val dirA2 = Files.createTempDirectory("soIdxA2").toString
    IndexBuild.build(spark, fileSrc, dirA2, cfg.copy(storageOrderIds = true))
    val mapA = a.docs.select($"docId", $"path").as[(Int, String)].collect().toMap
    val mapA2 = new SearchEngine(spark, dirA2).docs
      .select($"docId", $"path").as[(Int, String)].collect().toMap
    assert(mapA == mapA2)

    // within one input file, ids ascend with row order
    val rows = spark.read.parquet(cdir)
      .select(org.apache.spark.sql.functions.col("_metadata.file_path").as("f"),
        org.apache.spark.sql.functions.col("_metadata.row_index").as("ri"),
        $"path")
      .as[(String, Long, String)].collect()
    val pathToId = mapA.map(_.swap)
    rows.groupBy(_._1).foreach { case (_, fr) =>
      val sorted = fr.sortBy(_._2).map(r => pathToId(r._3))
      assert(sorted.zip(sorted.tail).forall { case (x, y) => y == x + 1 },
        "ids must be contiguous ascending within a file")
    }

    // retrieval equivalence modulo the id permutation: same (path, score)
    // result sets for BM25 search and same doc lens per path
    val byPathA = a.searchDF("even split", 40).join(a.docs, Seq("docId"))
      .select($"path", $"score").as[(String, Double)].collect().toMap
    val byPathB = b.searchDF("even split", 40).join(b.docs, Seq("docId"))
      .select($"path", $"score").as[(String, Double)].collect().toMap
    assert(byPathA == byPathB)
    val lensA = a.docs.select($"path", $"len").as[(String, Int)].collect().toMap
    val lensB = b.docs.select($"path", $"len").as[(String, Int)].collect().toMap
    assert(lensA == lensB)

    // the storage-order docs stage must not range-shuffle the corpus:
    // its lineage partitioning is per input FILE (3 files, 3 rows)
    val lin = Lineage.read(spark, dirA).filter($"stage" === "docs").count()
    assert(lin == 3, s"expected one docs lineage row per input file, got $lin")
  }

  test("sorted-id build tolerates null metadata columns; null content fails with the contract") {
    val dir = Files.createTempDirectory("nullMeta").toString
    val rows = Seq(
      SourceFile("r0", "p0.scala", null, null, "alpha beta"),
      SourceFile(null, "p1.scala", "c1", "scala", "gamma delta"))
    IndexBuild.build(spark, rows.toDS(), dir, cfg)
    val docs = spark.read.parquet(s"$dir/docs").collect()
    assert(docs.length == 2)
    assert(docs.exists(r => r.isNullAt(r.fieldIndex("commit"))), "null commit passes through")
    assert(docs.exists(r => r.isNullAt(r.fieldIndex("repo"))), "null repo passes through")
    assert(docs.forall(!_.isNullAt(4 - 4)), "docIds assigned") // docId col 0
    val e = new SearchEngine(spark, dir)
    assert(e.searchDF("alpha", 5).count() == 1)
    // null content: a clear contract error, not an NPE inside Sha
    val bad = Seq(SourceFile("r", "p", "c", "l", null)).toDS()
    val dir2 = Files.createTempDirectory("nullContent").toString
    val ex = intercept[Throwable](IndexBuild.build(spark, bad, dir2, cfg))
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("content must be non-null"),
      s"want the content contract in: $msgs")
  }

  test("storage-order falls back to sorted ids for non-file corpora") {
    val dir = Files.createTempDirectory("soFall").toString
    IndexBuild.build(spark, corpus(12).toDS(), dir, cfg.copy(storageOrderIds = true))
    val e = new SearchEngine(spark, dir)
    // sorted-path semantics: ids follow (repo, path, commit) rank
    val byKey = e.docs.select($"repo", $"path", $"commit", $"docId")
      .as[(String, String, String, Int)].collect().sortBy(r => (r._1, r._2, r._3))
    assert(byKey.map(_._4).toSeq == (0 until 12))
  }

  test("storage-order falls back for a FILTERED file corpus (row_index " +
      "is physical — filtered counts would collide docids)") {
    val cdir = Files.createTempDirectory("soFiltCorpus").toString
    corpus(40).toDS().repartition(3).write.mode("overwrite").parquet(cdir)
    // a filter that drops low physical row indices: on the broken path
    // file B's offset would overlap file A's surviving row_index range
    val filtered = spark.read.parquet(cdir).as[SourceFile]
      .filter(f => f.path.drop(1).dropRight(6).toInt % 2 == 1)
    val dir = Files.createTempDirectory("soFiltIdx").toString
    IndexBuild.build(spark, filtered, dir, cfg.copy(storageOrderIds = true))
    val e = new SearchEngine(spark, dir)
    val ids = e.docs.select($"docId").as[Int].collect().sorted.toSeq
    // dense, unique, 0..n-1 — the collision bug would duplicate ids
    assert(ids == (0 until 20), s"expected dense unique ids, got $ids")
    // and the sorted fallback's semantics hold
    val byKey = e.docs.select($"repo", $"path", $"commit", $"docId")
      .as[(String, String, String, Int)].collect().sortBy(r => (r._1, r._2, r._3))
    assert(byKey.map(_._4).toSeq == (0 until 20))
  }
}
