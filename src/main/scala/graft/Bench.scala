package graft
import org.apache.spark.sql.SparkSession

/** Bench main (driver contract): times every SparkEntry query at the
  * given SF, one JSON line on stdout. A warmup pass (trivial job + one
  * parquet scan) runs first so the first timed query doesn't absorb JVM/
  * codegen/FileSourceStrategy warmup; queries run in sorted name order
  * for run-to-run comparability.
  *
  * The stdout JSON line is kept under ~1400 chars: the harness that reads
  * it captures only the tail of the process output, and a per-query map
  * over 75+ queries at full double precision overflows that window (the
  * round-1/round-3 bench lines were truncated mid-map and unparseable).
  * So the line carries the headline total plus the slowest queries that
  * fit (3-decimal precision), and the FULL per-query map is written to
  * bench_details.json next to the build for anyone who wants all of it.
  */
object Bench {
  /** Fixed-work single-thread CPU canary (~1s on an idle core): a pure-JVM
    * xorshift+mix loop whose cost is constant across rounds, so ambient
    * host load shows up IN the artifact as canary drift. Reader protocol:
    * compare canary_sec across bench files before comparing query times —
    * a "regression" that co-moves with the canary is box noise, not code
    * (round 7's 84.7s-vs-56.9s driver/judge gap would have been
    * self-explaining). Min of 3 runs, same rationale as the query timings.
    */
  def canarySec(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9e3779b97f4a7c15L
      var acc = 0L
      var i = 0
      while (i < 200000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        acc += java.lang.Long.rotateLeft(x * 0xff51afd7ed558ccdL, 31)
        i += 1
      }
      if (acc == 42L) println("") // keep the loop observable to the JIT
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup: first pass pays JIT compilation, not representative
    Seq(once(), once(), once()).min
  }

  /** Fixed-work PARALLEL canary: one small 32-task shuffle, timed.
    * The single-thread canary reads per-core speed, but the round-11
    * driver artifacts showed multi-JOB queries stalling (13.3s vs 0.75s
    * idle) while the single-thread canary stayed flat — vCPU scheduling
    * starves task parallelism without slowing any one core. Reader
    * protocol: pcanary_max/pcanary co-moving with a query "regression"
    * = host jitter; flat pcanary spread + slow query = real. Both min
    * AND max of 3 are recorded because the spread IS the signal.
    */
  def parallelCanary(spark: SparkSession): (Double, Double) = {
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 3200000L, 1, 32).selectExpr("id % 9973 AS k")
        .groupBy("k").count().count()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup
    val runs = Seq(once(), once(), once())
    (runs.min, runs.max)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, cpus)
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables(spark, sfDir, "lineitem").count()
    // steady-state methodology: one untimed warmup (pays one-time
    // codegen/class-load compilation — the JVM, not the engine), then
    // MIN of 3 timed runs. Min, not mean: ambient load on a shared box
    // only ever ADDS time, so the minimum is the least-contaminated
    // estimate of the engine's cost (a round-5 driver artifact recorded
    // 113s for a 32s suite purely from end-of-session load).
    // GRAFT_BENCH_RUNS=1 for the heavy 10x stress gate, where the
    // quadratic-output queries make three passes cost an hour; clamped
    // so a typo'd 0/garbage value can't kill the bench mid-suite
    val nRuns = math.max(1,
      sys.env.get("GRAFT_BENCH_RUNS").flatMap(_.toIntOption).getOrElse(3))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      // a failing query must be distinguishable from a fast one: emit the
      // JSON per-query value as "error" instead of a normal-looking time
      val runs = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      (name, runs.map(_._1).min, runs.forall(_._2), runs.map(_._1).max)
    }
    val total = results.filter(_._3).map(_._2).sum
    // top-level error count: a broken run must not look like a fast run
    // to anything that reads only the headline value
    val errors = results.count(!_._3)
    // timed AFTER the sweep so they read the ambient load the queries saw
    val canary = canarySec()
    val (pcMin, pcMax) = parallelCanary(spark)

    // Locale.ROOT: the f interpolator uses the JVM default locale, which
    // on comma-decimal locales would emit "0,680" and break the JSON
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def entry(r: (String, Double, Boolean, Double)): String =
      "\"" + r._1 + "\":" + (if (r._3) fmt(r._2) else "\"error\"")

    // full detail (all queries, name order) → file, plus the per-query
    // min→max run spread: a query whose own 3 runs disagree by >2x was
    // jittered DURING this bench — distinguishable from a regression
    // (which moves min and max together) without a local re-run
    val fullQs = results.map(entry).mkString("{", ",", "}")
    val spreadQs = results.filter(_._3)
      .map(r => "\"" + r._1 + "\":[" + fmt(r._2) + "," + fmt(r._4) + "]")
      .mkString("{", ",", "}")
    val canaryStr = fmt(canary)
    val pcStr = s""""pcanary_sec":${fmt(pcMin)},"pcanary_max_sec":${fmt(pcMax)}"""
    val full = s"""{"metric":"total","value":$total,"unit":"sec","errors":$errors,"canary_sec":$canaryStr,$pcStr,"queries":$fullQs,"run_spread":$spreadQs,"n_queries":${results.size},"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter("bench_details.json")
      try w.println(full) finally w.close()
    } catch { case _: Throwable => () }

    // stdout line: errors first (never drop an "error" marker), then the
    // slowest queries that fit the length budget
    val prefix = s"""{"metric":"total","value":$total,"unit":"sec","errors":$errors,"canary_sec":$canaryStr,$pcStr,"n_queries":${results.size},"sf":"$sfDir","queries":{"""
    val suffix = "}}"
    val budget = 1400 - prefix.length - suffix.length
    val ranked = results.filter(!_._3) ++ results.filter(_._3).sortBy(-_._2)
    val kept = new scala.collection.mutable.ListBuffer[String]
    var used = 0
    ranked.foreach { r =>
      val e = entry(r)
      if (used + e.length + 1 <= budget) { kept += e; used += e.length + 1 }
    }
    println(prefix + kept.mkString(",") + suffix)
    spark.stop()
  }
}
