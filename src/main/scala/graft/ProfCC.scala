package graft
import graft.operators._
/** Scratch timer for the three connected-components queries (dev tool). */
object ProfCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32", "32")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"== $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    for (r <- 1 to 3) {
      println(s"-- round $r")
      time("dedup_assignments")(Dedup.dedupAssignments(spark, sfDir).count())
      time("dedup_corpus")(Dedup.dedupCorpus(spark, sfDir).count())
      time("embedding_clusters")(Similarity.embeddingClusters(spark, sfDir).count())
    }
    spark.stop()
  }
}
