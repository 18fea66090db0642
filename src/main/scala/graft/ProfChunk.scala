package graft
import org.apache.spark.sql.functions._
object ProfChunk {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32", "32")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"== $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    for (i <- 1 to 3; dir <- Seq("/root/testdata/sf0.1", "/tmp/sf1"))
      time(s"chunk_pairs $dir $i")(operators.Chunker.sharedChunkPairs(spark, dir).count())
    spark.stop()
  }
}
