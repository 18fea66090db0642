package graft.operators

import graft.SparkSpec

/** Lloyd training loop: convergence on separable blobs, exact member
  * recovery, and run-to-run determinism (the fixed-point accumulation
  * claim — the same corpus must train the identical index every time).
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight angular blobs; seeds (vec_id < 2) land one per blob
  private val blobA = Seq(0L -> 0.00f, 2L -> 0.05f, 3L -> -0.04f, 4L -> 0.08f)
    .map { case (id, j) => (id, Array(1.0f, j, 0.1f), 0) }
  private val blobB = Seq(1L -> 0.00f, 5L -> 0.06f, 6L -> -0.03f, 7L -> 0.07f)
    .map { case (id, j) => (id, Array(j, 1.0f, -0.1f), 1) }

  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("kmeans").toString
    (blobA ++ blobB).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("converges on separable blobs and recovers the exact membership") {
    val rows = Similarity.kmeansTrain(spark, dir, nlist = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    assert(rows.map(_._1).toSeq === Seq(0L, 1L))
    assert(rows.map(_._2).toSeq === Seq(4L, 4L), s"blob sizes: ${rows.toSeq}")
    assert(rows.forall(_._3), "loop must report convergence")
  }

  test("training is bit-deterministic across runs") {
    val a = Similarity.kmeansTrain(spark, dir, nlist = 2).collect().toSeq
    val b = Similarity.kmeansTrain(spark, dir, nlist = 2).collect().toSeq
    assert(a === b)
  }

  test("training with a reliable checkpoint dir matches the default strategy") {
    val ckDir = java.nio.file.Files.createTempDirectory("km-ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    val reliable = Similarity.kmeansTrain(spark, dir, nlist = 2,
      checkpoint = Dedup.reliableCheckpointStrategy).collect().toSeq
    val default = Similarity.kmeansTrain(spark, dir, nlist = 2).collect().toSeq
    assert(reliable === default)
    val wrote = new java.io.File(ckDir).listFiles()
    assert(wrote != null && wrote.nonEmpty, "no reliable checkpoint written")
  }
}
