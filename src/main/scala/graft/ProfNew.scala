package graft

import graft.operators._

/** Scratch timer for the round-3 additions at a chosen SF dir (dev tool):
  * `SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.ProfNew"`.
  */
object ProfNew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32", "32")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"== $name%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    for (round <- 1 to 2) {
      println(s"-- round $round")
      time("charEntropy")(TextOps.charEntropy(spark, sfDir).count())
      time("invertedIndex")(TextOps.invertedIndex(spark, sfDir).count())
      time("keywordSearch")(TextOps.keywordSearch(spark, sfDir).count())
      time("bigramSurprisal")(TextOps.bigramSurprisal(spark, sfDir).count())
      time("zipfSlope")(TextOps.zipfSlope(spark, sfDir).count())
      time("orderGaps")(Relational.orderGaps(spark, sfDir).count())
      time("approxQuantileAudit")(Events.approxQuantileAudit(spark, sfDir).count())
      time("dailyAnomalies")(Events.dailyAnomalies(spark, sfDir).count())
      time("kmeansStep")(Similarity.kmeansStep(spark, sfDir).count())
    }
    spark.stop()
  }
}
