package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

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
  * codegen'd projection with `ignoreNullFields=false` (a null column is
  * emitted as an explicit JSON null, so rows round-trip field-for-field;
  * the default silently drops null fields) — so the export runs at scan
  * speed; there is no driver-side iteration at any corpus size.
  */
object Export {

  /** Write `docs` as JSONL shards under `dstDir`, partitioned by the
    * `partitionCols` (default split+lang) with ≤ `maxRecordsPerFile`
    * lines per shard. All non-partition columns ride the JSON payload.
    * Returns the manifest: one row per partition with shard and record
    * counts.
    *
    * Manifest cost model (the reason it is NOT a read-back of the
    * output): record counts come from a column-pruned aggregation of the
    * INPUT — only the partition columns are scanned, the JSON payload is
    * neither recomputed nor re-read — and shard counts come from a
    * driver filesystem walk of the partition directories, which is
    * metadata-scale (O(#partitions + #files), zero data bytes). At
    * 100 TB a read-back manifest would double the export's I/O; this one
    * costs a partition-column scan plus a listing. Partition values in
    * the manifest are the input's own typed values (no re-inference from
    * path strings — a numeric-looking `lang` stays a string).
    */
  def trainingShards(docs: DataFrame, dstDir: String,
                     maxRecordsPerFile: Int = 100000,
                     partitionCols: Seq[String] = Seq("split", "lang")): DataFrame = {
    val spark = docs.sparkSession
    val payloadCols = docs.columns.filterNot(partitionCols.contains)
    docs
      .select(partitionCols.map(col) :+
        to_json(struct(payloadCols.map(col): _*),
          Map("ignoreNullFields" -> "false")).as("value"): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(partitionCols: _*)
      .text(dstDir)
    partitionManifest(docs, dstDir, partitionCols)
  }

  /** Write-side manifest for a Hive-partitioned export: per partition,
    * the shard (file) count from a metadata walk joined to the exact
    * record count from the input frame itself — the manifest never
    * reads the output back. Joined on the string form the committer
    * actually wrote: null and empty partition values both land in the
    * Hive default-partition dir, so translate them or those rows
    * silently vanish from an inner-joined manifest.
    */
  private def partitionManifest(docs: DataFrame, dstDir: String,
                                partitionCols: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    val counts = docs.groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("n_records"))
    val shards = shardCounts(spark, dstDir, partitionCols)
    def dirForm(c: org.apache.spark.sql.Column) = when(
      c.isNull || c.cast("string") === "",
      lit(ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
    ).otherwise(c.cast("string"))
    val cond = partitionCols
      .map(c => dirForm(counts(c)) === shards(s"__$c"))
      .reduce(_ && _)
    counts.join(broadcast(shards), cond)
      .select(partitionCols.map(col) :+ col("n_shards") :+ col("n_records"): _*)
      .orderBy(partitionCols.map(col): _*)
  }

  /** Columnar warehouse handoff: the typed sibling of the JSONL
    * [[trainingShards]] — same partition tree, same write-side manifest,
    * but the payload stays COLUMNAR (native ORC, no serialization to
    * text), sorted within partitions on `sortCol` so file/row-group
    * min-max stats are tight. The contract this buys downstream: any
    * engine reading the tree gets partition pruning from the dir layout
    * and predicate pushdown from the sorted stats (`InterchangeSpec`
    * asserts both on the read-back plan plus byte-exact round-trip,
    * arrays included). `maxRecordsPerFile` bounds shard size exactly as
    * in the text export.
    */
  def columnarShards(docs: DataFrame, dstDir: String,
                     maxRecordsPerFile: Int = 100000,
                     partitionCols: Seq[String] = Seq("split", "lang"),
                     sortCol: String = "doc_id"): DataFrame = {
    docs
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols :+ sortCol).map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(partitionCols: _*)
      .orc(dstDir)
    partitionManifest(docs, dstDir, partitionCols)
  }

  /** Training-ordered export: shards laid out by the reproducible
    * (shard, pos) permutation of `TextOps.trainingOrder` — shard
    * membership and intra-shard line order both derive from
    * md5(seed, doc_id), so a restarted run (or a second site) reads the
    * corpus in the identical order straight off the files, no shuffle at
    * load time. One `repartition(nShards, shard)` + sortWithinPartitions
    * carries the entire layout: hash routing means a task may own zero
    * or several whole shards (never a partial one), each kept contiguous
    * by the leading sort key, and the committer writes every shard's
    * lines already ordered (`maxRecordsPerFile` splits preserve order —
    * Spark numbers the split files in write order). Returns the same
    * manifest shape as [[trainingShards]].
    */
  def orderedTrainingShards(docs: DataFrame, dstDir: String,
                            nShards: Int = 8, seed: String = "s0",
                            maxRecordsPerFile: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    val payloadCols = docs.columns
    // the SAME key derivation trainingOrder uses — shared, not copied,
    // because the file layout's contract is to replay that permutation
    val (okCol, shardCol) = graft.operators.TextOps.trainingOrderKey(nShards, seed)
    val keyed = docs
      .withColumn("ok", okCol)
      .withColumn("shard", shardCol)
    keyed
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ok"), col("doc_id"))
      .select(col("shard"),
        to_json(struct(payloadCols.map(col): _*),
          Map("ignoreNullFields" -> "false")).as("value"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("shard")
      .text(dstDir)
    val counts = keyed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_records"))
    val shards = shardCounts(spark, dstDir, Seq("shard"))
    counts.join(broadcast(shards),
        counts("shard").cast("string") === shards("__shard"))
      .select(col("shard"), col("n_shards"), col("n_records"))
      .orderBy(col("shard"))
  }

  /** Curriculum-ordered JSONL shards: the physical layout of
    * `TextOps.curriculumOrder` — files partitioned by length-doubling
    * STAGE, lines inside each stage in the schedule's (md5 shuffle,
    * doc_id) order, so a trainer consuming stage directories in
    * ascending order and files in name order replays the curriculum
    * verbatim with zero load-time shuffle (the [[orderedTrainingShards]]
    * contract applied to a curriculum instead of a uniform permutation).
    * One repartition+sortWithinPartitions carries both stage membership
    * and intra-stage order into the committer.
    */
  def curriculumShards(docs: DataFrame, dstDir: String,
                       maxRecordsPerFile: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    val payloadCols = docs.columns
    val (stageCol, skCol) =
      graft.operators.TextOps.curriculumKey(col("text"), col("doc_id"))
    val keyed = docs
      .withColumn("stage", stageCol)
      .withColumn("sk", skCol)
    keyed
      .repartition(col("stage"))
      .sortWithinPartitions(col("stage"), col("sk"), col("doc_id"))
      .select(col("stage"),
        to_json(struct(payloadCols.map(col): _*),
          Map("ignoreNullFields" -> "false")).as("value"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("stage")
      .text(dstDir)
    val counts = keyed.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_records"))
    val shards = shardCounts(spark, dstDir, Seq("stage"))
    counts.join(broadcast(shards),
        counts("stage").cast("string") === shards("__stage"))
      .select(col("stage"), col("n_shards"), col("n_records"))
      .orderBy(col("stage"))
  }

  /** Per-partition shard (file) counts from a driver filesystem walk of
    * the Hive-style partition tree — a listing, never a data read. Dir
    * names are unescaped with the same codec the committer escaped them
    * with. Committer bookkeeping files (`_SUCCESS`, dotfiles) are not
    * shards.
    */
  private def shardCounts(spark: SparkSession, dstDir: String,
                          partitionCols: Seq[String]): DataFrame = {
    val root = new Path(dstDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(p: Path, depth: Int): Seq[(Seq[String], Long)] =
      if (depth == 0) {
        val n = fs.listStatus(p).count { s =>
          val nm = s.getPath.getName
          s.isFile && !nm.startsWith("_") && !nm.startsWith(".")
        }
        Seq((Nil, n.toLong))
      } else
        fs.listStatus(p).filter(_.isDirectory).toSeq.flatMap { d =>
          val name = d.getPath.getName
          val v = ExternalCatalogUtils.unescapePathName(
            name.substring(name.indexOf('=') + 1))
          walk(d.getPath, depth - 1).map { case (vs, n) => (v +: vs, n) }
        }
    val rows = walk(root, partitionCols.length)
      .map { case (vs, n) => Row.fromSeq(vs :+ n) }
    val schema = StructType(
      partitionCols.map(c => StructField(s"__$c", StringType)) :+
        StructField("n_shards", LongType))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
