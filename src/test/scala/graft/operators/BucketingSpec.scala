package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Bucketing: pre-partitioned co-located joins — the "reuse a
  * partitioning across stages" lever from the scale checklist. Writing
  * both join sides bucketed on the key lets every subsequent join/agg on
  * that key run shuffle-free; at 100 TB this converts the nightly join's
  * dominant cost into a one-time write-side cost.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def countShuffles(df: DataFrame): Int = {
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).count(_.isInstanceOf[ShuffleExchangeExec])
  }

  test("bucketed tables join without shuffling either side") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      Tables(spark, sf, "orders").write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bkt")
      Tables(spark, sf, "lineitem").write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bkt")
      val joined = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      // join + agg all reuse the bucket partitioning: zero data shuffles
      // until the (absent) final exchange
      assert(countShuffles(joined) === 0,
        joined.queryExecution.executedPlan.toString.take(3000))
      // and the result matches the unbucketed join
      val expected = Tables(spark, sf, "orders")
        .join(Tables(spark, sf, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .count()
      assert(joined.agg(org.apache.spark.sql.functions.sum($"n")).head().getLong(0)
        === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
