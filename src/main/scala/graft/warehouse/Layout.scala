package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-maintenance operators for a parquet warehouse: small-file
  * compaction and sort-clustered rewrite (the OPTIMIZE step of any
  * long-lived 100 TB table).
  *
  * Why it exists: streaming appends and fine-grained partition writes
  * accumulate kilobyte files; at scan time every file costs a task
  * launch and a footer read, so a million-file table is slow before a
  * single row is decoded. Rewriting to ~`targetFileBytes` files — and,
  * when a clustering key is given, range-partitioning + sorting by it —
  * restores (a) few right-sized tasks and (b) tight per-file min/max
  * statistics, which is what makes parquet row-group/file pruning
  * actually fire for range predicates on the cluster key (same
  * motivation as the geo bounding-box pre-filter: give the scan
  * something it can prune on).
  *
  * The reference analog is K1's batched loads (utils/__init__.py:17-56
  * commits every 100k rows); compaction is the columnar equivalent of
  * choosing a sane batch size after the fact.
  */
object Layout {

  /** Total on-disk bytes of the frame's input files (driver-side file
    * metadata only — no data read).
    */
  def inputBytes(df: DataFrame): Long = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    df.inputFiles.map { f =>
      val p = new Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
  }

  /** Rewrite `srcDir` (parquet) into `dstDir` as ~`targetFileBytes`
    * files. With `clusterBy` non-empty the rewrite range-partitions and
    * sorts within partitions on those columns, so each output file owns
    * a disjoint key range (prunable). Returns the output file count.
    *
    * Partition count derives from observed input bytes, floored at 1 —
    * parquet encoding usually tightens on rewrite (bigger row groups,
    * better dictionaries), so this errs toward files ≤ target size.
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
              targetFileBytes: Long = 128L << 20,
              clusterBy: Seq[String] = Nil): Int = {
    val df = spark.read.parquet(srcDir)
    val n = math.max(1, math.ceil(inputBytes(df).toDouble / targetFileBytes).toInt)
    val shaped =
      if (clusterBy.isEmpty) df.repartition(n)
      else {
        val cols = clusterBy.map(df.col)
        df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)
      }
    shaped.write.mode("overwrite").parquet(dstDir)
    spark.read.parquet(dstDir).inputFiles.length
  }
}
