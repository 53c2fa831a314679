package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the driver's smoke check: the flagship entry must return
  * rows on sf0.001. */
class EntrySpec extends AnyFunSuite {
  test("SparkEntry.entry returns ranked hits") {
    val df = SparkEntry.entry(SparkTestBase.spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.contains("score") && df.columns.contains("docId"))
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("every oracle key has a query and every query runs at sf0.001") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // each query must at least produce a schema (lazy plan) without error
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(SparkTestBase.spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, name)
    }
  }
}
