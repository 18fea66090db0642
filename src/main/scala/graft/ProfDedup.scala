package graft

import org.apache.spark.sql.functions._

/** Scratch stage-profiler for slow bench queries (dev tool): repeated
  * warm timings of the heavy dedup-suite queries, the only reliable way
  * to A/B under ambient load (single full-bench runs swing ±40%).
  * GRAFT_CC_DEBUG=1 additionally prints per-round connected-components
  * timings from Dedup.dedupClusters.
  */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32", "32")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"== $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    for (i <- 1 to 2) {
      time(s"decontamination $i")(operators.TextOps.decontamination(spark, sfDir).count())
      time(s"dedup_corpus $i")(operators.Dedup.dedupCorpus(spark, sfDir).count())
      time(s"frame_samples $i")(operators.Multimodal.frameSampleStats(spark, sfDir).count())
    }
    spark.stop()
  }
}
