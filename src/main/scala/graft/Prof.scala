package graft

/** Parameterized A/B query profiler (dev tool):
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Prof [q ...]"`.
  * Runs the named SparkEntry queries (default: the historically slow
  * set) for 3 rounds each, so per-query numbers can be compared A/B
  * despite ambient load — round 1 absorbs codegen/class-load warmup;
  * compare rounds 2-3. `GRAFT_CC_DEBUG=1` additionally prints per-round
  * timings inside the connected-components queries.
  */
object Prof {
  val defaults = Seq(
    "q_dedup_assignments", "q_dedup_corpus", "q_embedding_clusters",
    "q_chunk_pairs", "q_asof_join", "q_ann_recall", "q_token_cooccurrence",
    "q_minhash_jaccard_est", "q_inverted_index", "q_simhash_pairs",
    "q_decontamination", "q_topk_audit", "q_minhash_lsh_pairs",
    "q_region_revenue", "q_salted_join_revenue", "q_tfidf_top_terms")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32", "32")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables(spark, sfDir, "lineitem").count()
    val which = if (args.nonEmpty) args.toSeq else defaults
    which.filterNot(SparkEntry.queries.contains)
      .foreach(n => println(s"!! unknown query: $n (see SparkEntry.queries)"))
    for (round <- 1 to 3) {
      println(s"-- round $round")
      which.filter(SparkEntry.queries.contains).foreach { n =>
        val fn = SparkEntry.queries(n)
        val t0 = System.nanoTime(); val c = fn(spark, sfDir).count()
        println(f"== $n%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$c)")
      }
    }
    spark.stop()
  }
}
