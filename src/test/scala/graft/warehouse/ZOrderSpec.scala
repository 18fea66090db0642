package graft.warehouse

import graft.SparkSpec
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.expressions.ZOrderKey

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val base = "target/tmp/zorder-spec"

  /** Reference interleave, written independently of the expression. */
  private def refZ(dims: Seq[Long], bits: Int): Long = {
    val n = dims.size
    var acc = 0L
    for (i <- dims.indices; b <- 0 until bits) {
      acc |= (((dims(i) & ((1L << bits) - 1)) >> b) & 1L) << (b * n + i)
    }
    acc
  }

  private def zOf(dims: Long*): Any =
    ZOrderKey(dims.map(Literal.create(_, LongType))).eval(null)

  test("interleave matches an independent bit-spread reference") {
    val samples = Seq(
      Seq(0L, 0L), Seq(1L, 0L), Seq(0L, 1L), Seq(65535L, 65535L),
      Seq(12345L, 54321L), Seq(70000L, 3L), // > lane width: masked to low 16
      Seq(255L, 255L))
    samples.foreach { dims =>
      assert(zOf(dims: _*) === refZ(dims, 16), s"dims=$dims")
    }
    // canonical small cases: (x=1,y=0) -> bit 0, (x=0,y=1) -> bit 1
    assert(zOf(1L, 0L) === 1L)
    assert(zOf(0L, 1L) === 2L)
    assert(zOf(3L, 3L) === 15L)
    // 3 dims: lane stride 3
    assert(zOf(1L, 0L, 0L) === 1L)
    assert(zOf(0L, 1L, 0L) === 2L)
    assert(zOf(0L, 0L, 1L) === 4L)
    assert(zOf(5L, 6L, 7L) === refZ(Seq(5L, 6L, 7L), 16))
  }

  test("null dimension nulls the key; codegen path agrees with eval") {
    val df = Seq((Some(3L), Some(5L)), (None, Some(5L))).toDF("x", "y")
    val out = df.select(Layout.zOrderKey(Seq($"x", $"y")).as("z")).collect()
    assert(out(0).getLong(0) === refZ(Seq(3L, 5L), 16))
    assert(out(1).isNullAt(0))
    // codegen'd whole-stage result equals direct interpreted eval per row
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val viaDf = pairs.toDF("x", "y")
      .select($"x", $"y", Layout.zOrderKey(Seq($"x", $"y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { p =>
      assert(viaDf(p) === refZ(Seq(p._1, p._2), 16))
    }
  }

  test("z-order clustering bounds BOTH dims per file; lexicographic only one") {
    // 256x256 grid in scrambled order: every (x, y) exactly once
    val src = s"$base/grid"
    spark.range(65536L)
      .select(($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"),
        md5($"id".cast("string")).as("scramble"))
      .orderBy($"scramble").drop("scramble")
      .repartition(8).write.mode("overwrite").parquet(src)
    val bytes = Layout.inputBytes(spark.read.parquet(src))

    def fileRanges(dir: String): Array[(Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max($"x") - min($"x")).as("xr"), (max($"y") - min($"y")).as("yr"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))

    val zDst = s"$base/zorder"
    val zFiles = Layout.zOrderCompact(spark, src, zDst, Seq("x", "y"),
      targetFileBytes = math.max(1L, bytes / 16))
    assert(zFiles >= 8, s"expected a multi-file layout, got $zFiles")
    val zRanges = fileRanges(zDst)

    val lexDst = s"$base/lex"
    Layout.compact(spark, src, lexDst,
      targetFileBytes = math.max(1L, bytes / 16), clusterBy = Seq("x", "y"))
    val lexRanges = fileRanges(lexDst)

    // lexicographic: x is tight but y spans the whole domain in every file
    assert(lexRanges.map(_._2).min >= 250,
      "expected lexicographic files to cover ~all of y")
    // z-order: files are bounded in BOTH dims ON AVERAGE (a ~4k-point
    // z-segment covers one-to-two 64x64 quadrants; a file straddling a
    // high-order curve jump can legitimately span a dim, so the claim is
    // about typical files, which is what aggregate scan pruning sees)
    def avg(xs: Array[Long]): Double = xs.sum.toDouble / xs.length
    val avgX = avg(zRanges.map(_._1))
    val avgY = avg(zRanges.map(_._2))
    assert(avgX <= 140, s"z-order files average x-range $avgX")
    assert(avgY <= 140, s"z-order files average y-range $avgY")
    // rewrite is lossless
    assert(spark.read.parquet(zDst).count() === 65536L)
    assert(spark.read.parquet(zDst).select(sum($"x" * lit(65536L) + $"y")).head().getLong(0) ===
      spark.read.parquet(src).select(sum($"x" * lit(65536L) + $"y")).head().getLong(0))

    // The payoff: a predicate on the SECOND dimension only. Parquet
    // min/max stats let the scan skip row groups; under z-order most
    // files exclude the y-slice, under lexicographic (x, y) every file
    // spans all of y so nothing can be skipped. Measured as rows the
    // scan actually decoded.
    def scanRows(dir: String): Long = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      val q = spark.read.parquet(dir).filter($"y" >= 0L && $"y" <= 31L)
      val n = q.count()
      assert(n === 32L * 256) // correctness of the slice itself
      planNodes(q).collectFirst { case f: FileSourceScanExec =>
        f.metrics("numOutputRows").value
      }.getOrElse(fail("no FileSourceScanExec in plan"))
    }
    val zDecoded = scanRows(zDst)
    val lexDecoded = scanRows(lexDst)
    assert(lexDecoded === 65536L,
      s"lexicographic layout should decode everything, got $lexDecoded")
    assert(zDecoded <= 65536L / 3,
      s"z-order layout should skip most row groups, decoded $zDecoded")
  }
}
