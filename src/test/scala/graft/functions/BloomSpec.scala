package graft.functions

import java.io.ByteArrayOutputStream

import graft.SparkSpec
import graft.functions.expressions.BloomMightContain
import graft.operators.TextOps
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** The explicit bloom-probe surface: the [[BloomMightContain]] expression
  * (precomputed-set pruning — complementary to RuntimeFilterSpec's
  * join-derived InjectRuntimeFilter audit) and the bloom-pruned
  * decontamination operator built on it.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def serialize(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  private def probe(bytes: Array[Byte], key: org.apache.spark.sql.Column) =
    GraftBridge.column(BloomMightContain(
      GraftBridge.expression(lit(bytes)), GraftBridge.expression(key)))

  test("no false negatives; false-positive rate within 3x of requested fpp") {
    val member = (0L until 1000L).toDF("k")
    val bloom = member.stat.bloomFilter("k", 1000L, 0.01)
    val bytes = serialize(bloom)
    val misses = member.filter(!probe(bytes, $"k")).count()
    assert(misses === 0, "bloom probe produced a false negative")
    val nonMember = (100000L until 120000L).toDF("k")
    val fp = nonMember.filter(probe(bytes, $"k")).count()
    assert(fp.toDouble / 20000 < 0.03, s"false-positive rate $fp/20000 too high")
  }

  test("null key probes to NULL; codegen and interpreted agree") {
    val bloom = BloomFilter.create(10, 0.01)
    bloom.putLong(42L)
    val bytes = serialize(bloom)
    val df = Seq(Some(42L), Some(7L), None).toDF("k")
    val viaDf = df.select(probe(bytes, $"k").as("r")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(viaDf.toSeq === Seq(Some(true), Some(false), None))
    // interpreted path: direct eval() with resolved Literal children (the
    // Column bridge yields a pre-analysis node that is not evaluable)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{BinaryType, LongType}
    val expr = BloomMightContain(
      Literal.create(bytes, BinaryType), Literal.create(42L, LongType))
    assert(expr.eval(null) === true)
    val exprMiss = BloomMightContain(
      Literal.create(bytes, BinaryType), Literal.create(7L, LongType))
    assert(exprMiss.eval(null) === false)
    val exprNullBloom = BloomMightContain(
      Literal.create(null, BinaryType), Literal.create(7L, LongType))
    assert(exprNullBloom.eval(null) === null)
  }

  test("SQL registration: bloom_might_contain callable from spark.sql") {
    registry.registerAll(spark)
    val bloom = BloomFilter.create(10, 0.01)
    bloom.putLong(99L)
    spark.sql("DROP VIEW IF EXISTS bloom_probe_t")
    Seq(99L, 100L).toDF("k").createOrReplaceTempView("bloom_probe_t")
    val hex = serialize(bloom).map(b => f"$b%02X").mkString
    val out = spark.sql(
      s"SELECT k, bloom_might_contain(unhex('$hex'), k) AS hit " +
        "FROM bloom_probe_t ORDER BY k").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(1))).toSeq ===
      Seq((99L, true), (100L, false)))
  }

  test("bloomDecontamination matches exact decontamination bit for bit") {
    val exact = TextOps.decontamination(spark, sf).collect().toSeq
    val pruned = TextOps.bloomDecontamination(spark, sf).collect().toSeq
    assert(pruned === exact)
  }

  test("bloom probe prunes pre-shuffle: no shingle-carrying exchange below it") {
    val df = TextOps.bloomDecontamination(spark, sf)
    val nodes = planNodes(df)
    val probeFilters = nodes.collect {
      case f: FilterExec if f.condition.toString.contains("bloom_might_contain") => f
    }
    assert(probeFilters.nonEmpty, "expected a bloom_might_contain Filter in the plan")
    // The only exchange allowed below the probe is the pinned doc fan-out
    // (raw `text` payload); the shingle stream (`sh`/`h` columns) must
    // never be shuffled before the bloom filter has thinned it.
    probeFilters.foreach { f =>
      val below = f.collect { case s: ShuffleExchangeExec => s }
      below.foreach { s =>
        val cols = s.output.map(_.name).toSet
        assert(cols.contains("text") && !cols.contains("sh") && !cols.contains("h"),
          s"shingle-carrying exchange below the bloom probe: ${cols.mkString(",")}")
      }
    }
  }
}
