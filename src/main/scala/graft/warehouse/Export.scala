package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard export — the engine-to-trainer handoff: JSONL files
  * partitioned by (split, lang) with a bounded record count per shard.
  *
  * Why this shape: trainers consume line-delimited JSON in fixed-size
  * shards (shufflable, resumable, streamable); the partition directories
  * mean a run that wants `split=train/lang=en` lists exactly those files
  * (the same pruning story as the warehouse tables); and the record
  * bound keeps any single shard re-readable/re-downloadable in O(const).
  * Writing goes through Spark's committer, so a killed export never
  * leaves a half-visible shard set (the `_temporary` staging + atomic
  * rename is the same guarantee the ingest path's `.zip~` promote gives,
  * one level up).
  *
  * The row payload is `to_json(struct(...))` of the passed columns — a
  * codegen'd projection, so the export runs at scan speed; there is no
  * driver-side iteration at any corpus size.
  */
object Export {

  /** Write `docs` as JSONL shards under `dstDir`, partitioned by the
    * `partitionCols` (default split+lang) with ≤ `maxRecordsPerFile`
    * lines per shard. All non-partition columns ride the JSON payload.
    * Returns the manifest: one row per partition with shard and record
    * counts (computed from the written files' metadata — a listing-scale
    * job, not a data rescan of the payload).
    */
  def trainingShards(docs: DataFrame, dstDir: String,
                     maxRecordsPerFile: Int = 100000,
                     partitionCols: Seq[String] = Seq("split", "lang")): DataFrame = {
    val spark = docs.sparkSession
    val payloadCols = docs.columns.filterNot(partitionCols.contains)
    docs
      .select(partitionCols.map(col) :+
        to_json(struct(payloadCols.map(col): _*)).as("value"): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(partitionCols: _*)
      .text(dstDir)
    spark.read.text(dstDir)
      .select(partitionCols.map(col) :+ input_file_name().as("f"): _*)
      .groupBy(partitionCols.map(col): _*)
      .agg(countDistinct(col("f")).as("n_shards"), count(lit(1)).as("n_records"))
      .orderBy(partitionCols.map(col): _*)
  }
}
