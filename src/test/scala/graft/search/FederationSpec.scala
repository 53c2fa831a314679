package graft.search

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.SparkTestBase
import graft.corpus.CorpusGen
import graft.index.{IndexBuild, IndexConfig}

class FederationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("federated search merges weighted per-index top-k deterministically") {
    val cfg = IndexConfig(docsPerShard = 64, termBuckets = 2, blockSize = 16,
      numPartitions = 2)
    val dirs = Seq("idxA" -> 200L, "idxB" -> 150L).map { case (uid, n) =>
      val d = Files.createTempDirectory(uid).toString
      IndexBuild.build(spark,
        CorpusGen.generate(spark, n, seed = n).as[graft.corpus.SourceFile], d, cfg)
      uid -> new SearchEngine(spark, d)
    }
    // equal weights: both indexes contribute, merged order is by score
    val fed = Federation.search(
      Seq((dirs(0)._1, dirs(0)._2, 1.0), (dirs(1)._1, dirs(1)._2, 1.0)),
      "merge buffer", 10, conjunctive = false)
      .as[(String, Int, Double)].collect().toSeq
    assert(fed.size == 10)
    val scores = fed.map(_._3)
    assert(scores == scores.sorted.reverse)
    assert(fed.map(_._1).toSet == Set("idxA", "idxB"))
    // the merged list is exactly the 10 best of the union of both top-10s
    val unionTop = (dirs(0)._2.searchDF("merge buffer", 10, conjunctive = false)
      .as[(Int, Double)].collect().map(r => ("idxA", r._1, r._2)) ++
      dirs(1)._2.searchDF("merge buffer", 10, conjunctive = false)
        .as[(Int, Double)].collect().map(r => ("idxB", r._1, r._2)))
      .sortBy(r => (-r._3, r._1, r._2)).take(10).toSeq
    assert(fed == unionTop)
    // down-weighting an index scales its merged scores
    val fedW = Federation.search(
      Seq((dirs(0)._1, dirs(0)._2, 1.0), (dirs(1)._1, dirs(1)._2, 0.5)),
      "merge buffer", 10, conjunctive = false)
      .as[(String, Int, Double)].collect().toSeq
    val wScores = fedW.map(_._3)
    assert(wScores == wScores.sorted.reverse)
    fedW.filter(_._1 == "idxB").foreach { r =>
      val own = dirs(1)._2.searchDF("merge buffer", 200, conjunctive = false)
        .as[(Int, Double)].collect().find(_._1 == r._2).get._2
      assert(math.abs(r._3 - own * 0.5) < 1e-9)
    }
  }
}
