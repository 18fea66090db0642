package graft.warehouse

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private val base = "target/tmp/layout-spec"

  test("compact merges a fragmented table without losing rows") {
    val src = s"$base/frag"
    val dst = s"$base/compacted"
    Tables(spark, sf, "documents").repartition(40)
      .write.mode("overwrite").parquet(src)
    val fragFiles = spark.read.parquet(src).inputFiles.length
    assert(fragFiles >= 30) // genuinely fragmented input
    val outFiles = Layout.compact(spark, src, dst, targetFileBytes = 1L << 30)
    assert(outFiles === 1) // whole table far below one target file
    val a = spark.read.parquet(src).orderBy($"doc_id").collect()
    val b = spark.read.parquet(dst).orderBy($"doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("clustered compaction yields disjoint per-file key ranges") {
    val src = s"$base/frag2"
    val dst = s"$base/clustered"
    Tables(spark, sf, "documents").repartition(20)
      .write.mode("overwrite").parquet(src)
    // force several output files to make the range property observable
    val bytes = Layout.inputBytes(spark.read.parquet(src))
    val out = Layout.compact(spark, src, dst,
      targetFileBytes = math.max(1L, bytes / 4), clusterBy = Seq("doc_id"))
    assert(out >= 2)
    val ranges = spark.read.parquet(dst)
      .groupBy(input_file_name().as("f"))
      .agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1) // files own disjoint ranges
      case _ =>
    }
    assert(spark.read.parquet(dst).count() ===
      spark.read.parquet(src).count())
  }
}
