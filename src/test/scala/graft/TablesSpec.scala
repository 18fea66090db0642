package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tables reader edge cases: dotted column names, nested-NTZ guard, and
  * the UTC session-timezone precondition (ADVICE round-6 findings).
  */
class TablesSpec extends SparkSpec {

  private def writeTable(dir: String, name: String)(df: org.apache.spark.sql.DataFrame): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")

  test("dotted top-level column name survives NTZ normalization") {
    val dir = java.nio.file.Files.createTempDirectory("tables-dotted").toString
    val df = spark.range(3)
      .withColumn("evt.ts", lit("2024-05-01 12:34:56").cast(TimestampNTZType))
    writeTable(dir, "dotted")(df)

    val out = Tables(spark, dir, "dotted")
    val f = out.schema.fields.find(_.name == "evt.ts").get
    assert(f.dataType == TimestampType,
      "dotted NTZ column must be rebuilt as the literal top-level column")
    // wall-clock preserved bit-for-bit under the UTC session zone
    val v = out.select(col("`evt.ts`").cast("string")).distinct().collect()
    assert(v.map(_.getString(0)).toSeq == Seq("2024-05-01 12:34:56"))
  }

  test("nested TimestampNTZ is rejected loudly, not half-converted") {
    val dir = java.nio.file.Files.createTempDirectory("tables-nested").toString
    val df = spark.range(2).withColumn("payload",
      struct(lit("2024-05-01 00:00:00").cast(TimestampNTZType).as("inner")))
    writeTable(dir, "nested")(df)

    val e = intercept[IllegalArgumentException] { Tables(spark, dir, "nested") }
    assert(e.getMessage.contains("nested TimestampNTZ"))
  }

  test("non-UTC session timezone is rejected") {
    val dir = java.nio.file.Files.createTempDirectory("tables-tz").toString
    writeTable(dir, "plain")(spark.range(2).toDF("id"))
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Europe/Berlin")
      val e = intercept[IllegalArgumentException] { Tables(spark, dir, "plain") }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }
}
