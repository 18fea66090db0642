package graft

import org.apache.spark.sql.functions._

/** Dev tool: build an N×-scale stress copy of a testdata dir by unioning
  * key-shifted copies (consistent shifts across FK domains; dimension
  * tables stay single-copy; document text perturbed per copy so the dedup
  * suite sees realistic large near-dup clusters instead of pure exact
  * copies). Used to check that every operator's runtime scales ~linearly
  * before trusting the 100 TB posture:
  *
  *   runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 runMain graft.Bench
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.local("32", "32")

    def maxOf(table: String, col0: String): Long =
      Tables(spark, src, table).agg(max(col(col0))).head().getLong(0) + 1

    val custShift = maxOf("customer", "c_custkey")
    val orderShift = maxOf("orders", "o_orderkey")
    val eventShift = maxOf("events", "event_id")
    val docShift = maxOf("documents", "doc_id")
    val vecShift = maxOf("embeddings", "vec_id")

    def write(table: String)(copy: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame): Unit = {
      val base = Tables(spark, src, table)
      (0 until copies).map(i => copy(base, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"scaled $table x$copies")
    }

    // dimensions stay single-copy (the broadcast side must stay small)
    Seq("region", "nation", "supplier", "part").foreach { t =>
      Tables(spark, src, t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    write("customer")((df, i) => df.withColumn("c_custkey", col("c_custkey") + lit(i * custShift)))
    write("orders")((df, i) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * orderShift))
      .withColumn("o_custkey", col("o_custkey") + lit(i * custShift)))
    write("lineitem")((df, i) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * orderShift)))
    write("events")((df, i) => df
      .withColumn("event_id", col("event_id") + lit(i * eventShift))
      .withColumn("user_id", col("user_id") + lit(i * custShift)))
    write("documents") { (df, i) =>
      val suffix = s" r$i"
      val d = df.withColumn("doc_id", col("doc_id") + lit(i * docShift))
      if (i == 0) d
      else d.withColumn("text", concat(col("text"), lit(suffix)))
        .withColumn("n_chars", col("n_chars") + lit(suffix.length.toLong))
    }
    write("embeddings")((df, i) => df.withColumn("vec_id", col("vec_id") + lit(i * vecShift)))
    spark.stop()
  }
}
