package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("dot, norms, cosine on known vectors") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      vectors.dot($"a", $"b").as("dot"),
      vectors.l2Norm($"a").as("na"),
      vectors.cosineSimilarity($"a", $"b").as("cos"),
      vectors.l2Distance($"a", $"b").as("dist")).head()
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(27)) < 1e-12)
  }

  test("native DotProduct expression is bit-identical to the HOF composition") {
    val e = graft.Tables(spark, sf, "embeddings")
      .select($"vec_id", vectors.toDoubleArray($"embedding").as("v"))
    val q = e.limit(1).select($"v".as("qv"))
    val diff = e.crossJoin(q)
      .select((vectors.dot($"v", $"qv") === vectors.dotHof($"v", $"qv")).as("eq"))
      .filter(!$"eq")
    assert(diff.count() === 0)
  }

  test("dot of mismatched-length or null-element arrays is NULL (HOF parity)") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)), // length mismatch
    ).toDF("a", "b")
    assert(df.select(vectors.dot($"a", $"b")).head().isNullAt(0))
    assert(df.select(vectors.dotHof($"a", $"b")).head().isNullAt(0))
    val withNull = spark.sql(
      "SELECT array(1.0d, CAST(NULL AS DOUBLE)) AS a, array(1.0d, 2.0d) AS b")
    assert(withNull.select(vectors.dot($"a", $"b")).head().isNullAt(0))
    assert(withNull.select(vectors.dotHof($"a", $"b")).head().isNullAt(0))
  }

  test("native L2SqFixed expression is bit-identical to the HOF composition") {
    val e = graft.Tables(spark, sf, "embeddings")
      .select($"vec_id", vectors.toDoubleArray($"embedding").as("v"))
    val q = e.limit(1).select($"v".as("qv"))
    val diff = e.crossJoin(q)
      .select((vectors.l2SqFixed($"v", $"qv") ===
        vectors.l2SqFixedHof($"v", $"qv")).as("eq"))
      .filter(!$"eq")
    assert(diff.count() === 0)
    // exact .5-boundary term: (x-y)^2 * 1e12 = 2.25 rounds HALF_UP to 2
    // in BOTH forms (Spark Round semantics replicated in the codegen)
    val half = Seq((Seq(1.5e-6), Seq(0.0))).toDF("a", "b")
    assert(half.select(vectors.l2SqFixed($"a", $"b")).head().getLong(0) ===
      half.select(vectors.l2SqFixedHof($"a", $"b")).head().getLong(0))
  }

  test("l2SqFixed of mismatched-length or null-element arrays is NULL (HOF parity)") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(df.select(vectors.l2SqFixed($"a", $"b")).head().isNullAt(0))
    assert(df.select(vectors.l2SqFixedHof($"a", $"b")).head().isNullAt(0))
    val withNull = spark.sql(
      "SELECT array(1.0d, CAST(NULL AS DOUBLE)) AS a, array(1.0d, 2.0d) AS b")
    assert(withNull.select(vectors.l2SqFixed($"a", $"b")).head().isNullAt(0))
    assert(withNull.select(vectors.l2SqFixedHof($"a", $"b")).head().isNullAt(0))
  }

  test("cosine of identical vectors is 1") {
    val df = Seq(Tuple1(Seq(0.5f, -1.5f, 2.0f))).toDF("v")
      .select(vectors.toDoubleArray($"v").as("v"))
    val c = df.select(vectors.cosineSimilarity($"v", $"v")).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
