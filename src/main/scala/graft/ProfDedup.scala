package graft

import org.apache.spark.sql.functions._

/** Scratch stage-profiler for slow bench queries (dev tool). */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = Sessions.local("32", "32")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"== $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    time("assignments 1")(operators.Dedup.dedupAssignments(spark, sfDir).count())
    time("assignments 2")(operators.Dedup.dedupAssignments(spark, sfDir).count())
    spark.stop()
  }
}
