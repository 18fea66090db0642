package graft

import graft.functions.text
import org.apache.spark.sql.functions._

/** Scratch stage-profiler for the minhash pipeline (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32", "32")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"== $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    val docs = Tables(spark, sfDir, "documents")
    time("scan")(docs.count())
    time("tokenize+size")(docs.select(text.wsTokenCount(col("text")).as("n")).agg(sum(col("n"))).count())
    time("shingle explode")(docs.select(col("doc_id"),
      explode(text.wordShingles(col("text"), 3)).as("sh")).count())
    val sh = docs.filter(text.wsTokenCount(col("text")) >= 3)
      .select(col("doc_id"), explode(text.wordShingles(col("text"), 3)).as("sh"))
    time("+12 md5")(sh.select((0 until 12).map(i =>
      md5(concat(lit(s"$i:"), col("sh"))).as(s"m$i")): _*).count())
    val minCols = (0 until 12).map(i => min(md5(concat(lit(s"$i:"), col("sh")))).as(s"mh$i"))
    val mins = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    time("groupBy 12 mins")(mins.count())
    time("groupBy 12 mins again")(mins.count())
    val minsR = docs.repartition(col("doc_id")).filter(text.wsTokenCount(col("text")) >= 3)
      .select(col("doc_id"), explode(text.wordShingles(col("text"), 3)).as("sh"))
      .groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    time("repartitioned mins")(minsR.count())
    time("full lsh pairs")(operators.Dedup.minhashLshPairs(spark, sfDir).count())
    spark.stop()
  }
}
