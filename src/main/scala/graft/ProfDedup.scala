package graft

import org.apache.spark.sql.functions._

/** Scratch stage-profiler for the dedup-assignments pipeline (dev tool). */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32", "32")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"== $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    time("lsh pairs")(operators.Dedup.minhashLshPairs(spark, sfDir).count())
    time("full assignments 1")(operators.Dedup.dedupAssignments(spark, sfDir).count())
    time("full assignments 2")(operators.Dedup.dedupAssignments(spark, sfDir).count())
    spark.stop()
  }
}
