package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden port of the reference's only unit spec: the Spock data table in
  * streaming/src/test/java/.../utils/GeoPredicateSpec.groovy:27-32
  * (XComp/vbb-data-pipeline), row for row.
  */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private val table = Seq(
    // centerLat, centerLon, radiusM, lat, lon, isCloseEnough
    (0.0, 0.0, 0.0, 0.0, 0.0, true),
    (0.0, 0.0, 1000000.0, 1.0, 0.0, true),
    (0.0, 0.0, 1000.0, 1.0, 0.0, false),
    (52.52437, 13.41053, 30000.0, 52.39886, 13.06566, true),
    (52.52437, 13.41053, 25000.0, 52.39886, 13.06566, false))

  test("haversine radius predicate matches the reference Spock table") {
    val df = table.toDF("clat", "clon", "r", "lat", "lon", "expected")
    val got = df.withColumn("inside",
        geo.haversineMeters($"clat", $"clon", $"lat", $"lon") <= $"r")
      .select($"inside", $"expected").collect()
    got.foreach(r => assert(r.getBoolean(0) === r.getBoolean(1)))
  }

  test("one degree of latitude is ~111.2 km") {
    val d = Seq((0.0)).toDF("x")
      .select(geo.haversineMeters(lit(0.0), lit(0.0), lit(1.0), lit(0.0)).as("d"))
      .head().getDouble(0)
    assert(math.abs(d - 111194.9) < 100)
  }

  test("distance is symmetric and zero on identity") {
    val df = Seq((52.5, 13.4, 48.1, 11.6)).toDF("a", "b", "c", "d")
    val r = df.select(
      geo.haversineMeters($"a", $"b", $"c", $"d").as("ab"),
      geo.haversineMeters($"c", $"d", $"a", $"b").as("ba"),
      geo.haversineMeters($"a", $"b", $"a", $"b").as("self")).head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)
    assert(r.getDouble(2) === 0.0)
  }

  test("bounding box is a strict superset of the radius circle") {
    // dense grid around the centre: every in-radius point must be in-box
    val centerLat = 52.52437; val centerLon = 13.41053; val r = 30000.0
    val grid = for (i <- -60 to 60; j <- -60 to 60)
      yield (centerLat + i * 0.01, centerLon + j * 0.01)
    val df = grid.toDF("lat", "lon")
      .select(
        geo.withinRadius($"lat", $"lon", centerLat, centerLon, r).as("in_r"),
        geo.inBoundingBox($"lat", $"lon", centerLat, centerLon, r).as("in_b"))
    assert(df.filter($"in_r" && !$"in_b").count() === 0)
    // and the box is tight: it must not admit everything
    assert(df.filter(!$"in_b").count() > 0)
  }
}
