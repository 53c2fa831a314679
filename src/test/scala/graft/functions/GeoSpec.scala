package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.query.FilterParser

/** Geo filters + geoSort (reference: haversine distance
  * crates/milli/src/lib.rs:322-329; _geoRadius/_geoBoundingBox
  * filter-parser/src/lib.rs:370-400; geo_sort.rs ascending distance,
  * missing geo last). */
class GeoSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // (id, lat, lng): NYC, Philadelphia, London, Sydney, null-geo
  lazy val df = Seq(
    (1, Some(40.7128), Some(-74.0060)),  // NYC
    (2, Some(39.9526), Some(-75.1652)),  // Philadelphia (~130 km from NYC)
    (3, Some(51.5074), Some(-0.1278)),   // London (~5570 km from NYC)
    (4, Some(-33.8688), Some(151.2093)), // Sydney (~15990 km from NYC)
    (5, None, None)                      // no geo fields
  ).toDF("id", Geo.LatCol, Geo.LngCol)

  private def distTo(lat: Double, lng: Double) =
    Geo.haversineMeters(col(Geo.LatCol), col(Geo.LngCol), lat, lng)

  test("haversine matches known city distances within 0.5%") {
    val d = df.select($"id", distTo(40.7128, -74.0060).as("d"))
      .as[(Int, Option[Double])].collect().toMap
    assert(math.abs(d(1).get) < 1.0)                       // self ≈ 0
    assert(math.abs(d(2).get / 129600.0 - 1.0) < 0.005)    // NYC–PHL ~129.6 km
    assert(math.abs(d(3).get / 5570220.0 - 1.0) < 0.005)   // NYC–LON ~5570 km
    assert(math.abs(d(4).get / 15990000.0 - 1.0) < 0.005)  // NYC–SYD ~15990 km
    assert(d(5).isEmpty)                                    // null propagates
  }

  test("_geoRadius filter parses and selects within-radius docs; null geo never matches") {
    def ids(f: String) =
      df.filter(FilterParser.parse(f)).select("id").as[Int].collect().sorted.toSeq
    assert(ids("_geoRadius(40.7128, -74.0060, 200000)") == Seq(1, 2))
    assert(ids("_geoRadius(40.7128, -74.0060, 6000000)") == Seq(1, 2, 3))
    // composes with boolean operators like any other condition
    assert(ids("_geoRadius(40.7128, -74.0060, 6000000) AND id > 1") == Seq(2, 3))
    assert(ids("NOT _geoRadius(40.7128, -74.0060, 6000000)") == Seq(4))
  }

  test("_geoBoundingBox: plain box and antimeridian wrap") {
    def ids(f: String) =
      df.filter(FilterParser.parse(f)).select("id").as[Int].collect().sorted.toSeq
    // box over the US east coast: TR then BL (reference argument order)
    assert(ids("_geoBoundingBox([45, -70], [35, -80])") == Seq(1, 2))
    // box crossing the antimeridian: lng >= 140 OR lng <= -170 → Sydney
    assert(ids("_geoBoundingBox([0, -170], [-40, 140])") == Seq(4))
  }

  test("geoSortAsc orders by ascending distance with missing geo last") {
    val got = df.orderBy(Geo.geoSortAsc(40.7128, -74.0060), $"id".asc)
      .select("id").as[Int].collect().toSeq
    assert(got == Seq(1, 2, 3, 4, 5))
  }

  test("geo expressions are codegen'd columns (no UDF in the plan)") {
    val plan = df.filter(Geo.geoRadius(40.7, -74.0, 1000.0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"))
  }
}
