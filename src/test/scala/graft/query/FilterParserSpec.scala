package graft.query

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class FilterParserSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  lazy val df = Seq(
    (1, "scala", 10.0, "src/a"),
    (2, "rust", 25.0, "src/b"),
    (3, "scala", 40.0, "lib/c"),
    (4, null.asInstanceOf[String], 55.0, ""),
    (5, "go", 70.0, "src/d")
  ).toDF("id", "lang", "score", "path")

  def ids(f: String): Seq[Int] =
    df.filter(FilterParser.parse(f)).select("id").as[Int].collect().sorted.toSeq

  test("equality and inequality") {
    assert(ids("lang = scala") == Seq(1, 3))
    assert(ids("lang != scala") == Seq(2, 5)) // null excluded, like the reference
    assert(ids("lang = 'scala'") == Seq(1, 3))
    assert(ids("""lang = "rust"""") == Seq(2))
  }

  test("numeric comparisons") {
    assert(ids("score > 40") == Seq(4, 5))
    assert(ids("score >= 40") == Seq(3, 4, 5))
    assert(ids("score < 25") == Seq(1))
    assert(ids("score <= 25") == Seq(1, 2))
  }

  test("TO range is inclusive") {
    assert(ids("score 25 TO 55") == Seq(2, 3, 4))
  }

  test("IN list") {
    assert(ids("lang IN [scala, go]") == Seq(1, 3, 5))
    assert(ids("lang IN ['scala', 'rust']") == Seq(1, 2, 3))
  }

  test("EXISTS / IS NULL / IS EMPTY") {
    assert(ids("lang EXISTS") == Seq(1, 2, 3, 5))
    assert(ids("lang NOT EXISTS") == Seq(4))
    assert(ids("lang IS NULL") == Seq(4))
    assert(ids("lang IS NOT NULL") == Seq(1, 2, 3, 5))
    assert(ids("path IS EMPTY") == Seq(4))
    assert(ids("path IS NOT EMPTY") == Seq(1, 2, 3, 5))
  }

  test("CONTAINS / STARTS WITH") {
    assert(ids("path CONTAINS src") == Seq(1, 2, 4, 5).filter(i => Seq(1, 2, 5).contains(i)))
    assert(ids("path STARTS WITH lib") == Seq(3))
  }

  test("boolean combinators with precedence and parens") {
    assert(ids("lang = scala AND score > 20") == Seq(3))
    assert(ids("lang = scala OR lang = go") == Seq(1, 3, 5))
    assert(ids("lang = go OR lang = scala AND score > 20") == Seq(3, 5))
    assert(ids("(lang = go OR lang = scala) AND score > 20") == Seq(3, 5))
    assert(ids("NOT lang = scala") == Seq(2, 5))
    assert(ids("NOT (score 25 TO 55)") == Seq(1, 5))
  }

  test("bad input raises") {
    intercept[Exception](FilterParser.parse("lang ="))
    intercept[Exception](FilterParser.parse("(lang = a"))
    intercept[Exception](FilterParser.parse("lang = a extra junk ="))
  }
}
