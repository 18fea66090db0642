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
    for (i <- 1 to 2) {
      time(s"join_revenue $i")(operators.Relational.joinRevenue(spark, sfDir).count())
      time(s"salted $i")(operators.Relational.saltedJoinRevenue(spark, sfDir).count())
    }
    operators.Relational.saltedJoinRevenue(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
