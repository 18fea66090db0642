package graft

/** Scratch timer for the queries the round-3 bench flagged slow (dev tool):
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ProfSlow"`.
  * 3 rounds so per-query numbers can be compared A/B despite ambient load.
  */
object ProfSlow {
  val names = Seq(
    "q_region_revenue", "q_dedup_corpus", "q_simhash_pairs",
    "q_minhash_lsh_pairs", "q_purchasers_without_errors",
    "q_minhash_signatures", "q_embedding_clusters", "q_token_cooccurrence",
    "q_quality_weighted_sample", "q_minhash_jaccard_est", "q_tfidf_top_terms",
    "q_quality_scores", "q_salted_join_revenue", "q_type_transitions",
    "q_profile_orders")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32", "32")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables(spark, sfDir, "lineitem").count()
    val which = if (args.nonEmpty) args.toSeq else names
    for (round <- 1 to 3) {
      println(s"-- round $round")
      which.foreach { n =>
        val fn = SparkEntry.queries(n)
        val t0 = System.nanoTime(); val c = fn(spark, sfDir).count()
        println(f"== $n%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$c)")
      }
    }
    spark.stop()
  }
}
