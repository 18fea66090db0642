package graft.warehouse

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
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

  test("compactBucketedTable merges streaming appends into one file per " +
       "bucket; probe plan stays shuffle-free on the index side and " +
       "results are unchanged") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val table = "winnow_idx_compact_test"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_compacting")
    val docs = Tables(spark, sf, "documents").select($"doc_id", $"text")
    // initial build + three appends — exactly the file pattern
    // Streams.winnowIndexSink leaves behind after three micro-batches
    graft.operators.TextOps.writeWinnowIndexFrom(
      docs.filter($"doc_id" % 4 === 0), table)
    (1 to 3).foreach { i =>
      graft.operators.TextOps
        .winnowSelectedFrom(docs.filter($"doc_id" % 4 === i), 4, 4)
        .select($"doc_id", $"h").distinct()
        .write.mode("append").bucketBy(8, "h").sortBy("h")
        .saveAsTable(table)
    }
    def probe(): DataFrame = {
      val q = graft.operators.TextOps
        .winnowSelectedFrom(docs.filter($"doc_id" < 20), 4, 4)
        .select($"doc_id".as("new_doc"), $"h").distinct()
      q.join(spark.table(table).select($"doc_id".as("index_doc"), $"h"),
          Seq("h"))
        .groupBy($"new_doc", $"index_doc")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_shared"))
        .orderBy($"new_doc", $"index_doc")
    }
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    // no shuffle may sit between the index scan and the probe join (the
    // bucketed scan carries the join partitioning); batch-side and
    // downstream shuffles are fine
    def indexSideShuffles(df: DataFrame): Int = {
      df.collect()
      def scansIndex(p: SparkPlan): Boolean = walk(p).exists {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains(table))
        case _ => false
      }
      def isJoin(p: SparkPlan): Boolean =
        p.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
        p.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]
      val probeChild = walk(df.queryExecution.executedPlan)
        .filter(isJoin)
        .flatMap(_.children.find(c =>
          scansIndex(c) && !walk(c).drop(1).exists(isJoin)))
        .headOption
      assert(probeChild.isDefined,
        df.queryExecution.executedPlan.toString.take(3000))
      walk(probeChild.get).count(_.isInstanceOf[ShuffleExchangeExec])
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val before = probe()
      val beforeRows = before.collect().toSeq
      assert(indexSideShuffles(before) === 0)
      val fragFiles = spark.table(table).inputFiles.length
      assert(fragFiles > 8, s"appends should fragment: $fragFiles files")
      val (b, a) = Layout.compactBucketedTable(spark, table, 8, "h")
      assert(b === fragFiles && a === 8,
        s"expected 8 post-compaction files, got $a:\n" +
          spark.table(table).inputFiles.mkString("\n"))
      val after = probe()
      assert(after.collect().toSeq === beforeRows,
        "compaction changed probe results")
      assert(indexSideShuffles(after) === 0,
        "compaction broke the bucketed (shuffle-free) probe plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_compacting")
    }
  }

  // --- compactPartitionedText crash-state recovery ---------------------
  // The swap protocol must never lose committed rows, in particular when
  // a restarted streaming sink APPENDS between a crash and the next
  // compaction (its _pack_state offsets are already advanced, so lost
  // appends are never replayed — silent permanent loss).

  private def hfs = new org.apache.hadoop.fs.Path(base)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def buildTextTree(dir: String): Unit = {
    Seq(("en", 0L, "en-a"), ("en", 0L, "en-b"), ("en", 1L, "en-c"),
        ("de", 0L, "de-a"), ("de", 0L, "de-b"))
      .toDF("lang", "bin", "value")
      .write.mode("overwrite").partitionBy("lang", "bin").text(dir)
  }

  private def treeRows(dir: String): Set[String] =
    spark.read.text(dir).collect().map(_.getString(0)).toSet

  private def copyDir(src: String, dst: String): Unit = {
    val fs = hfs
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(src), fs,
      new org.apache.hadoop.fs.Path(dst), false, false,
      spark.sparkContext.hadoopConfiguration)
    ()
  }

  private def appendRow(dir: String, part: String, row: String): Unit = {
    val fs = hfs
    val p = new org.apache.hadoop.fs.Path(s"$dir/$part/appended-$row.txt")
    val out = fs.create(p, false)
    out.write((row + "\n").getBytes("UTF-8"))
    out.close()
  }

  private def noSwapDebris(dir: String): Unit = {
    val fs = hfs
    val leftover = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
      .filter(n => n.startsWith("_new_") || n.startsWith("_old_"))
    assert(leftover.isEmpty, s"swap debris left behind: ${leftover.toSeq}")
  }

  test("compactPartitionedText recovery keeps post-crash appends when the " +
       "swap never started (stale _new_ alongside a live dir)") {
    val dir = s"$base/crash-stale-new"
    buildTextTree(dir)
    val baseline = treeRows(dir)
    // crash between staging renames and promotes: a complete compacted
    // copy sits at _new_lang=en while the live dir is untouched...
    copyDir(s"$dir/lang=en", s"$dir/_new_lang=en")
    // ...and the restarted sink then commits another micro-batch
    appendRow(dir, "lang=en/bin=0", "en-post-crash")
    val (_, after) = Layout.compactPartitionedText(spark, dir)
    assert(after >= 1)
    assert(treeRows(dir) === baseline + "en-post-crash",
      "recovery must not delete the live dir's post-crash appends")
    noSwapDebris(dir)
  }

  test("compactPartitionedText recovery finishes a mid-swap crash " +
       "(live dir absent, _old_ + _new_ present)") {
    val dir = s"$base/crash-mid-swap"
    buildTextTree(dir)
    val baseline = treeRows(dir)
    copyDir(s"$dir/lang=en", s"$dir/_new_lang=en")
    hfs.rename(new org.apache.hadoop.fs.Path(s"$dir/lang=en"),
      new org.apache.hadoop.fs.Path(s"$dir/_old_lang=en"))
    val (_, after) = Layout.compactPartitionedText(spark, dir)
    assert(after >= 1)
    assert(treeRows(dir) === baseline)
    noSwapDebris(dir)
  }

  test("compactPartitionedText recovery merges post-crash appends into a " +
       "mid-swap dir (live recreated by the sink, _old_ + _new_ present)") {
    val dir = s"$base/crash-merge"
    buildTextTree(dir)
    val baseline = treeRows(dir)
    copyDir(s"$dir/lang=en", s"$dir/_new_lang=en")
    hfs.rename(new org.apache.hadoop.fs.Path(s"$dir/lang=en"),
      new org.apache.hadoop.fs.Path(s"$dir/_old_lang=en"))
    // the restarted sink recreates the live dir with post-crash rows only
    hfs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/lang=en/bin=0"))
    appendRow(dir, "lang=en/bin=0", "en-post-crash")
    appendRow(dir, "lang=en/bin=1", "en-post-crash-2")
    val (_, after) = Layout.compactPartitionedText(spark, dir)
    assert(after >= 1)
    assert(treeRows(dir) ===
      baseline + "en-post-crash" + "en-post-crash-2",
      "recovery must keep BOTH the pre-crash compacted copy and the " +
        "sink's post-crash appends")
    noSwapDebris(dir)
  }

  test("compactPartitionedText recovery drops a superseded _old_ left by " +
       "a crash after the promote") {
    val dir = s"$base/crash-old-only"
    buildTextTree(dir)
    val baseline = treeRows(dir)
    copyDir(s"$dir/lang=de", s"$dir/_old_lang=de")
    val (_, after) = Layout.compactPartitionedText(spark, dir)
    assert(after >= 1)
    assert(treeRows(dir) === baseline)
    noSwapDebris(dir)
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
