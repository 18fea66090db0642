package graft.gtfs

import graft.SparkSpec

/** Distance-along-shape over GTFS shapes.txt rows (the reference loads
  * the table at 05-create-schema.sh:108-119 in XComp/vbb-data-pipeline
  * but never queries it): cumulative haversine by shape_pt_sequence,
  * millimetre fixed-point legs. Golden lengths anchor on the ~111.195 km
  * meridian degree the GeoSpec suite already pins.
  */
class ShapeSpec extends SparkSpec {
  import spark.implicits._

  // two shapes, rows deliberately OUT of sequence order: the operator
  // must order by shape_pt_sequence, not input order
  private val shapes = Seq(
    ("A", 2, 1.0, 0.0),
    ("A", 1, 0.0, 0.0),
    ("A", 3, 1.0, 1.0),
    ("B", 1, 52.5, 13.4)
  ).toDF("shape_id", "shape_pt_sequence", "shape_pt_lat", "shape_pt_lon")

  test("per-point legs and cumulative distance follow sequence order") {
    val got = ArrivalsQuery.distanceAlongShape(shapes)
      .orderBy($"shape_id", $"shape_pt_sequence")
      .select($"shape_id", $"shape_pt_sequence", $"leg_mm", $"cum_mm")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 4)
    // first point of each shape: no predecessor, zero leg
    assert(got(0) === ("A", 1, 0L, 0L))
    // (0,0)->(1,0): one meridian degree ≈ 111194.9 m (GeoSpec golden)
    val leg2 = got(1)._3
    assert(math.abs(leg2 - 111194900L) < 100000L)
    assert(got(1)._4 === leg2) // cum = 0 + leg
    // (1,0)->(1,1): one longitude degree at lat 1°, slightly shorter
    val leg3 = got(2)._3
    assert(leg3 < leg2 && leg3 > 111000000L)
    assert(got(2)._4 === leg2 + leg3) // integer cumulative is exact
    assert(got(3) === ("B", 1, 0L, 0L))
  }

  test("per-shape rollup: point count and total length") {
    val got = ArrivalsQuery.shapeLengths(shapes)
      .orderBy($"shape_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => (t._1, t._2)).toSeq === Seq(("A", 3L), ("B", 1L)))
    val perPoint = ArrivalsQuery.distanceAlongShape(shapes)
      .groupBy($"shape_id").sum("leg_mm").orderBy($"shape_id")
      .collect().map(_.getLong(1))
    assert(got.map(_._3).toSeq === perPoint.toSeq) // total = Σ legs, exact
  }
}
