package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.RDDScanExec

/** Candidate-pair reuse: one banding pass feeds every graph consumer.
  * The shared frame is localCheckpoint'ed, so consumer plans must read a
  * materialized RDD scan — the shingle→minhash→band→bucket-join pipeline
  * cannot re-evaluate per consumer (it is simply absent from their
  * plans), and results are unchanged vs the derive-inline paths.
  */
class PairReuseSpec extends SparkSpec {
  import spark.implicits._

  private def readsMaterializedPairs(df: DataFrame): Unit = {
    val nodes = planNodes(df)
    assert(nodes.exists(_.isInstanceOf[RDDScanExec]),
      "consumer does not read the checkpointed pair RDD")
    // the banding pipeline's minhash columns must not appear anywhere:
    // their presence would mean the pass re-evaluated inside this plan
    assert(!nodes.exists(_.toString.contains("mh0")),
      "minhash banding re-evaluated in a consumer plan")
  }

  test("text graph consumers fan out from one materialized banding pass") {
    val pairs = Dedup.sharedLshPairs(spark, sf)
    val overlap = Dedup.sourceOverlap(spark, sf, pairs)
    val contain = Dedup.containmentPairs(spark, sf, pairs, 3)
    val ranks = Dedup.nearDupPageRank(spark, sf, pairs, 3)
    readsMaterializedPairs(overlap)
    readsMaterializedPairs(contain)
    // results identical to the single-consumer derive-inline paths
    assert(overlap.collect().toSeq === Dedup.sourceOverlap(spark, sf).collect().toSeq)
    assert(contain.collect().toSeq === Dedup.containmentPairs(spark, sf).collect().toSeq)
    assert(ranks.collect().toSeq === Dedup.nearDupPageRank(spark, sf).collect().toSeq)
  }

  test("bitext mining consumes a shared cross-half sims frame unchanged, " +
       "and the margin windows never re-band") {
    val sims = Similarity.sharedCrossHalfSims(spark, sf)
    val viaShared = Similarity.bitextMine(spark, sims, 4, 10200L)
    // the consumer plan reads the materialized collision frame: no band
    // projection (plane dot products) may appear inside it
    val nodes = planNodes(viaShared)
    assert(nodes.exists(_.isInstanceOf[RDDScanExec]),
      "margin windows do not read the checkpointed sims RDD")
    assert(!nodes.exists(_.toString.contains("bs")),
      "band projection re-evaluated inside the mining plan")
    assert(viaShared.collect().toSeq ===
      Similarity.bitextMine(spark, sf).collect().toSeq)
  }

  test("embedding clusters consume a shared pair frame unchanged") {
    val pairs = Similarity.sharedEmbeddingPairs(spark, sf)
    val viaShared = Similarity.embeddingClusters(spark, pairs).collect().toSeq
    assert(viaShared === Similarity.embeddingClusters(spark, sf).collect().toSeq)
    assert(pairs.queryExecution.executedPlan.isInstanceOf[RDDScanExec] ||
      planNodes(pairs).exists(_.isInstanceOf[RDDScanExec]))
  }
}
