package graft.functions.aggregates

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BottomK must equal the row_number-window draw exactly — including
  * under adversarial partitioning, since min-k merge associativity is
  * the whole claim that makes it oracle-checkable.
  */
class BottomKSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 500L).map(i => (s"g${i % 7}", i))

  private def windowDraw(k: Int): Set[(String, Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"g").orderBy($"p", $"id")
    rows.toDF("g", "id")
      .withColumn("p", md5(concat(lit("t:"), $"id".cast("string"))))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"g", $"rk".cast("long"), $"id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def aggDraw(k: Int, parts: Int): Set[(String, Long, Long)] =
    rows.toDF("g", "id").repartition(parts)
      .withColumn("p", md5(concat(lit("t:"), $"id".cast("string"))))
      .select($"g", $"p", $"id").as[(String, String, Long)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(new BottomK(k).toColumn)
      .toDF("g", "picks")
      .select($"g", posexplode($"picks"))
      .select($"g", ($"pos" + 1).cast("long").as("rk"), $"col._2".as("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("equals the window draw at any parallelism") {
    val expected = windowDraw(5)
    assert(aggDraw(5, 1) === expected)
    assert(aggDraw(5, 32) === expected)
  }

  test("groups smaller than k return the whole group, ranked") {
    val got = Seq(("a", 1L), ("a", 2L)).toDF("g", "id")
      .withColumn("p", md5($"id".cast("string")))
      .select($"g", $"p", $"id").as[(String, String, Long)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(new BottomK(10).toColumn)
      .head()._2
    assert(got.map(_._2).toSet === Set(1L, 2L))
  }
}
