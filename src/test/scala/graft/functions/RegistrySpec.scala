package graft.functions

import graft.SparkSpec

class RegistrySpec extends SparkSpec {

  test("native dot_product works from pure SQL") {
    registry.registerAll(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS dp")
      .head()
    assert(r.getDouble(0) === 32.0)
  }

  test("dot_product nulls propagate, not crash") {
    registry.registerAll(spark)
    val r = spark.sql(
      "SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS dp").head()
    assert(r.isNullAt(0))
  }
}
