package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force top-k returns k rows, sorted by similarity") {
    val df = Similarity.bruteForceTopK(spark, sf, queryId = 0L, k = 10)
    val sims = df.select($"cos_sim").collect().map(_.getDouble(0)).toSeq
    assert(sims.length === 10)
    assert(sims === sims.sorted.reverse)
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("IVF search result is a subset of the query cell, never the query itself") {
    val df = Similarity.ivfTopK(spark, sf, queryId = 0L, k = 5)
    val rows = df.collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getLong(0) != 0L))
    assert(rows.map(_.getLong(1)).distinct.length === 1) // single cell searched
  }
}
