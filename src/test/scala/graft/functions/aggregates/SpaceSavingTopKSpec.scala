package graft.functions.aggregates

import graft.{SparkSpec, Tables}
import graft.functions.text
import org.apache.spark.sql.functions._

class SpaceSavingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("with capacity above the vocabulary it matches the exact top-k") {
    val toks = Tables(spark, sf, "documents")
      .select($"lang", explode(text.tokensLower($"text")).as("tok"))
    val distinctToks = toks.select($"tok").distinct().count().toInt
    val sketch = toks.as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new SpaceSavingTopK(distinctToks + 1, 5).toColumn)
      .collect().toMap
    val exact = toks.groupBy($"lang", $"tok").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(
        _.map(t => t._2 -> t._3).sortBy { case (key, c) => (-c, key) }.take(5).toSeq)
      .toMap
    assert(sketch.keySet === exact.keySet)
    sketch.foreach { case (lang, top) => assert(top === exact(lang)) }
  }

  test("under eviction pressure heavy hitters survive with overestimate-only counts") {
    // one dominant key + a long singleton tail, tiny capacity
    val data = (Seq.fill(500)("hot") ++ (1 to 400).map(i => s"cold_$i")).toDS()
    val Seq(top) = data.groupByKey(_ => 0)
      .agg(new SpaceSavingTopK(8, 1).toColumn)
      .collect().head._2.toSeq
    assert(top._1 === "hot")
    assert(top._2 >= 500L) // space-saving never undercounts
    assert(top._2 <= 500L + 400L) // and overestimates at most by evictions
  }
}
