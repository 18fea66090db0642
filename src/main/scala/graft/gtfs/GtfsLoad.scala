package graft.gtfs

import graft.functions.dates
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import java.io.{File, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** GTFS warehouse loader — the Spark re-expression of the reference's
  * `database_load` DAG (airflow/plugins/database_loader/operators.py:31-171
  * in XComp/vbb-data-pipeline).
  *
  * Warehouse layout: one parquet dataset per table under `warehouseDir/
  * <table>`, partitioned by (provider_id, run_id) — the provenance pair
  * the reference stamps on every row. Partition pruning turns per-feed
  * queries into single-partition scans at any corpus size; appends of a
  * new run never rewrite old partitions.
  *
  * Idempotency (reference ON CONFLICT DO NOTHING + run anti-join):
  *  - run level: candidate (provider_id, run_date) pairs are anti-joined
  *    against the run table (operators.py:68-90);
  *  - row level: within a re-loaded run, rows left_anti existing PKs
  *    before append (utils/__init__.py:55-56);
  *  - archive level: CRC32-XOR content fingerprint dedup
  *    (data_provider/operators.py:145-152).
  *
  * Scale posture: the driver-side work is only zip member extraction (one
  * pass per archive, parallelizable across archives); all CSV parsing,
  * conforming, dedup joins, and writes are distributed Spark jobs.
  */
class GtfsLoad(spark: SparkSession, warehouseDir: String) {
  import spark.implicits._

  private def tablePath(t: String) = s"$warehouseDir/$t"
  private def exists(t: String) = Files.exists(Paths.get(tablePath(t)))

  /** Warehouse table; a missing feed table yields an EMPTY frame with the
    * canonical schema + provenance pair, so downstream joins still resolve
    * (a feed may legitimately omit optional members like calendar_dates).
    */
  def table(name: String): DataFrame =
    if (exists(name)) spark.read.parquet(tablePath(name))
    else GtfsSchemas.feedTables.get(name) match {
      case Some(schema) =>
        val withProv = org.apache.spark.sql.types.StructType(
          schema.fields.toSeq :+
            org.apache.spark.sql.types.StructField("provider_id", StringType) :+
            org.apache.spark.sql.types.StructField("run_id", org.apache.spark.sql.types.IntegerType))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withProv)
      case None => spark.emptyDataFrame
    }

  // ---- run / provider dimensions ----------------------------------------

  /** run dimension: (run_id, run_date, provider_id). Surrogate run_id is
    * max+1 on the single-writer driver (deterministic under retry, unlike
    * monotonically_increasing_id — SURVEY §2.12 I1).
    */
  def nextRunId(): Int =
    if (!exists("run")) 1
    else table("run").agg(coalesce(max($"run_id"), lit(0))).head().getInt(0) + 1

  def registerProvider(providerId: String): Unit = {
    val existing = if (exists("provider"))
      table("provider").filter($"provider_id" === providerId).count() else 0L
    if (existing == 0L) {
      Seq(providerId).toDF("provider_id")
        .withColumn("created", current_timestamp())
        .write.mode(SaveMode.Append).parquet(tablePath("provider"))
    }
  }

  def registerRun(providerId: String, runDate: String): Int = {
    val id = nextRunId()
    Seq((id, runDate, providerId)).toDF("run_id", "run_date", "provider_id")
      .write.mode(SaveMode.Append).parquet(tablePath("run"))
    id
  }

  /** New-data identification (J2): candidates minus already-loaded runs. */
  def identifyNewRuns(candidates: Seq[(String, String)]): Seq[(String, String)] = {
    val cand = candidates.toDF("provider_id", "run_date")
    val newOnes =
      if (!exists("run")) cand
      else cand.join(table("run"), Seq("provider_id", "run_date"), "left_anti")
    newOnes.collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  // ---- archive fingerprint (A2/J3/I4) -----------------------------------

  /** XOR-fold of member CRC32s — order-insensitive archive fingerprint
    * (reference data_provider/operators.py:145-152). CRCs come from the
    * zip central directory: no member decompression needed.
    */
  def archiveChecksum(zipPath: String): Long = {
    val zf = new ZipFile(zipPath)
    try zf.entries().asScala.foldLeft(0L)((acc, e) => acc ^ e.getCrc)
    finally zf.close()
  }

  /** True if an archive with this fingerprint was already ingested;
    * otherwise records it. Manifest table: (provider_id, run_date, checksum).
    */
  def checkAndRecordChecksum(providerId: String, runDate: String, checksum: Long): Boolean = {
    val dup = exists("archive_manifest") &&
      table("archive_manifest").filter($"checksum" === checksum).count() > 0
    if (!dup)
      Seq((providerId, runDate, checksum)).toDF("provider_id", "run_date", "checksum")
        .write.mode(SaveMode.Append).parquet(tablePath("archive_manifest"))
    dup
  }

  // ---- CSV conform ------------------------------------------------------

  /** Header sanitize: strip every char outside [a-z_] (reference KVV fix,
    * database_loader/operators.py:160-162).
    */
  private[gtfs] def sanitizeHeader(name: String): String =
    name.toLowerCase.replaceAll("[^a-z_]", "")

  /** Read one extracted CSV member and conform it to the canonical schema:
    * header sanitize, ""->NULL, type casts, GTFS time parse, missing
    * columns null-filled, unknown columns dropped.
    */
  private[gtfs] def conform(csvPath: String, tableName: String): DataFrame = {
    val target = GtfsSchemas.feedTables(tableName)
    val raw = spark.read
      .option("header", true).option("nullValue", "")
      .schema(StructType(
        // read everything as string first; casts below are explicit so a
        // malformed value becomes NULL, not a hard failure
        spark.read.option("header", true).csv(csvPath).columns
          .map(c => org.apache.spark.sql.types.StructField(c, StringType))))
      .csv(csvPath)
    val cleaned = raw.toDF(raw.columns.map(sanitizeHeader): _*)
    val timeCols = GtfsSchemas.gtfsTimeColumns.getOrElse(tableName, Nil)
    val cols = target.fields.map { f =>
      if (!cleaned.columns.contains(f.name)) lit(null).cast(f.dataType).as(f.name)
      else if (timeCols.contains(f.name)) dates.gtfsTimeToSeconds(col(f.name)).as(f.name)
      else if (f.dataType == org.apache.spark.sql.types.BooleanType)
        // GTFS encodes booleans as 0/1
        (col(f.name).cast("int") === 1).as(f.name)
      else col(f.name).cast(f.dataType).as(f.name)
    }
    cleaned.select(cols.toIndexedSeq: _*)
  }

  // ---- load -------------------------------------------------------------

  /** Extract zip members to a temp dir; returns member-stem -> file path.
    * Members with no schema entry are skipped (operators.py:144-147).
    */
  private def extractMembers(zipPath: String): Map[String, String] = {
    val outDir = Files.createTempDirectory("gtfs_extract").toFile
    val zf = new ZipFile(zipPath)
    try {
      zf.entries().asScala.flatMap { e =>
        val stem = e.getName.stripSuffix(".txt")
        if (e.isDirectory || !GtfsSchemas.feedTables.contains(stem)) None
        else {
          val f = new File(outDir, e.getName)
          val in = zf.getInputStream(e)
          val out = new FileOutputStream(f)
          try in.transferTo(out) finally { in.close(); out.close() }
          Some(stem -> f.getAbsolutePath)
        }
      }.toMap
    } finally zf.close()
  }

  /** Idempotent per-table append: prepend provenance, CHECK-split, PK
    * anti-join against existing rows, partitioned write. Returns
    * (appended, quarantined) row counts.
    */
  def appendTable(tableName: String, conformed: DataFrame,
                  runId: Int, providerId: String): (Long, Long) = {
    val withProv = conformed
      .withColumn("run_id", lit(runId))
      .withColumn("provider_id", lit(providerId))
    // cache: the CHECK split and anti-join feed both a count and a write
    // (without it each conform+filter DAG re-executes per action)
    withProv.cache()
    try {
      val (ok, quarantined) = GtfsSchemas.checkConstraints.get(tableName) match {
        case Some(pred) => (withProv.filter(pred), withProv.filter(!pred))
        case None => (withProv, spark.emptyDataFrame)
      }
      val qn = if (quarantined.isEmpty) 0L else {
        quarantined.write.mode(SaveMode.Append)
          .partitionBy("provider_id", "run_id")
          .parquet(tablePath(s"${tableName}_rejects"))
        quarantined.count()
      }
      val pk = GtfsSchemas.primaryKeys.getOrElse(tableName,
        Seq("run_id") ++ conformed.columns)
      val fresh =
        if (!exists(tableName)) ok
        else ok.join(
          // pruned to this run's partition by the run_id filter
          table(tableName).filter($"run_id" === runId || $"provider_id" === providerId)
            .select(pk.map(col).toIndexedSeq: _*),
          pk, "left_anti").cache()
      val n = fresh.count()
      if (n > 0)
        fresh.write.mode(SaveMode.Append)
          .partitionBy("provider_id", "run_id")
          .parquet(tablePath(tableName))
      fresh.unpersist()
      (n, qn)
    } finally withProv.unpersist()
  }

  /** Load one archive end-to-end in FK waves. Returns per-table appended
    * counts; None if the run was already loaded or the archive is a
    * content-duplicate.
    *
    * Failure atomicity: the run row and checksum manifest are written
    * only AFTER every table appended successfully — a mid-load crash
    * leaves the run unregistered, so the retry re-enters (run anti-join
    * passes) and the PK anti-join appends skip whatever rows the failed
    * attempt already landed. Recording bookkeeping first would instead
    * permanently fence out the archive.
    */
  def loadArchive(providerId: String, runDate: String, zipPath: String): Option[Map[String, Long]] = {
    if (identifyNewRuns(Seq((providerId, runDate))).isEmpty) return None
    val checksum = archiveChecksum(zipPath)
    if (exists("archive_manifest") &&
      table("archive_manifest").filter(col("checksum") === checksum).count() > 0)
      return None
    registerProvider(providerId)
    val runId = nextRunId()
    val members = extractMembers(zipPath)
    val counts = GtfsSchemas.loadWaves.flatMap { wave =>
      wave.flatMap { t =>
        members.get(t).map { path =>
          t -> appendTable(t, conform(path, t), runId, providerId)._1
        }
      }
    }.toMap
    // commit point: run row + manifest only once all appends succeeded
    Seq((runId, runDate, providerId)).toDF("run_id", "run_date", "provider_id")
      .write.mode(SaveMode.Append).parquet(tablePath("run"))
    checkAndRecordChecksum(providerId, runDate, checksum)
    Some(counts)
  }

  /** Referential-integrity audit: orphan rows per declared FK edge. */
  def fkOrphans(childTable: String): Map[String, Long] =
    GtfsSchemas.foreignKeys.getOrElse(childTable, Nil).map { case (parent, keys) =>
      val child = table(childTable)
      val par = table(parent).select(keys.map(k => col(k._2)).toIndexedSeq: _*)
      val joined = child.join(par,
        keys.map { case (ck, pk) => child(ck) === par(pk) }.reduce(_ && _),
        "left_anti")
      parent -> joined.count()
    }.toMap
}
