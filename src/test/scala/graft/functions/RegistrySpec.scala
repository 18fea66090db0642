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

  test("GraftExtensions injects dot_product into a fresh extension-built session") {
    import org.apache.spark.sql.SparkSession
    // getOrCreate returns the suite session unless active/default are
    // cleared; the new session shares the SparkContext (never stopped)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp").head()
      assert(r.getDouble(0) === 11.0)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
