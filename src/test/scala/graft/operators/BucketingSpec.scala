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

  /** The stored-index contract of the incremental probes: the index side
    * of the batch-vs-index join must come straight off the bucketed scan
    * with NO exchange between scan and join — only the (small) batch
    * side may shuffle.
    */
  private def assertIndexSideUnshuffled(df: DataFrame, tablePrefix: String): Unit = {
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    def scansIndex(p: SparkPlan): Boolean = walk(p).exists {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(tablePrefix))
      case _ => false
    }
    def isJoin(p: SparkPlan): Boolean =
      p.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
      p.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec] ||
      p.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]
    val joins = walk(df.queryExecution.executedPlan).filter(isJoin)
    // the INNERMOST join over the index scan — the band-bucket probe
    // itself, not a downstream join whose subtree happens to contain it
    val probeJoin = joins.find(j => j.children.exists(c =>
      scansIndex(c) && !walk(c).drop(1).exists(isJoin)))
    assert(probeJoin.isDefined,
      s"no join reads the $tablePrefix scan directly:\n" +
        df.queryExecution.executedPlan.toString.take(3000))
    val indexChild = probeJoin.get.children.find(c =>
      scansIndex(c) && !walk(c).drop(1).exists(isJoin)).get
    val shuffles = walk(indexChild).count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles === 0,
      s"index side shuffled:\n${indexChild.toString.take(3000)}")
  }

  test("incremental LSH probe reads the stored band index without shuffling it") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = Dedup.incrementalLshPairs(spark, sf)
      assertIndexSideUnshuffled(pairs, "graft_lsh_index_")
      // and the explicit-index overload lands on the same stored table
      val explicit = Dedup.incrementalLshPairs(spark, sf,
        Dedup.bandIndexFor(spark, sf,
          org.apache.spark.sql.functions.col("doc_id") % 4 === 3, 3, 12, 3),
        org.apache.spark.sql.functions.col("doc_id") % 4 === 3, 3, 12, 3, false)
      assert(pairs.collect().toSeq === explicit.collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("incremental embedding probe reads the stored band index without shuffling it") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = Similarity.incrementalEmbeddingPairs(spark, sf)
      assertIndexSideUnshuffled(pairs, "graft_emb_index_")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("cross-half collision joins the two stored band indexes with " +
       "no exchange on EITHER side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val r = Similarity.autoPlanesPerBand(
        Tables(spark, sf, "embeddings").count())
      val even = Similarity.embeddingBandIndexByPred(spark, sf,
        $"vec_id" % 2 === 0, r, 24)
      val odd = Similarity.embeddingBandIndexByPred(spark, sf,
        $"vec_id" % 2 === 1, r, 24)
      // the exact collision join sharedCrossHalfSims issues: both sides
      // are bucketed by (band, sig) with the same bucket count, so the
      // join must be satisfied by the stored layout — zero exchanges
      val cand = even.alias("bx")
        .join(odd.alias("by"),
          org.apache.spark.sql.functions.col("bx.band") ===
            org.apache.spark.sql.functions.col("by.band") &&
          org.apache.spark.sql.functions.col("bx.sig") ===
            org.apache.spark.sql.functions.col("by.sig"))
        .select(org.apache.spark.sql.functions.col("bx.vec_id").as("x"),
          org.apache.spark.sql.functions.col("by.vec_id").as("y"))
      assert(countShuffles(cand) === 0,
        cand.queryExecution.executedPlan.toString.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("incremental winnow probe reads the stored fingerprint index without shuffling it") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = TextOps.winnowIncrementalPairs(spark, sf)
      assertIndexSideUnshuffled(pairs, "graft_winnow_index_")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
