package graft

/** Scratch stage-profiler for the round-3 bench tail (dev tool):
  * repeated warm timings of every query the round-2 driver bench put
  * over ~2s, so optimizations A/B against a stable local baseline
  * (single full-bench runs swing ±40% under ambient load).
  */
object ProfTail {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32", "32")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables(spark, sfDir, "documents").count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"== $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    val tail = Seq("q_decontamination", "q_simhash_pairs", "q_tfidf_top_terms",
      "q_minhash_signatures", "q_dedup_corpus", "q_dedup_assignments",
      "q_top_tokens", "q_minhash_lsh_pairs", "q_hyperplane_lsh_topk",
      "q_ivf_topk", "q_chunk_pairs")
    for (i <- 1 to 3; name <- tail)
      time(s"$name $i")(SparkEntry.queries(name)(spark, sfDir).count())
    spark.stop()
  }
}
