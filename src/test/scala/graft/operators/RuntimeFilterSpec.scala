package graft.operators

import graft.{SparkSpec, Tables}

/** Runtime bloom-filter join pruning (Catalyst InjectRuntimeFilter) — the
  * AQE-era sibling of dynamic partition pruning: a selective filter on
  * the dimension side materializes a bloom filter that pre-filters the
  * FACT side's shuffle input, so at 100 TB the big table's exchange
  * carries only rows that can possibly join. Nothing to implement — the
  * audit proves our join shapes qualify for the rule (equi-join,
  * selective creation side, shuffle join) and that thresholds are the
  * only thing separating local-scale plans from cluster-scale ones.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim filter injects might_contain on the fact side") {
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force a shuffle join (the rule skips broadcast joins — broadcast
      // already avoids the fact-side shuffle) and drop the size gates
      // that at test SF would say "fact too small to bother"
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val dim = Tables(spark, sf, "orders")
        .filter($"o_orderpriority" === "1-URGENT") // likely-selective predicate
      val fact = Tables(spark, sf, "lineitem")
      val joined = fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n${optimized.take(3000)}")
      val n = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // pruning must not change the result
      val expected = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders")
          .filter($"o_orderpriority" === "1-URGENT"),
          $"l_orderkey" === $"o_orderkey")
        .count()
      assert(n("1-URGENT") === expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
