package graft
import java.nio.file.{Files, Paths}

/** Dev tool: dump `.explain("formatted")` for named SparkEntry queries into
  * `<outDir>/<query>_<tag>.txt` — the optimization rounds' plan evidence
  * (`plans/r13/<query>_before.txt` / `..._after.txt`).
  *
  * Usage: `runMain graft.Plans <sfDir> <outDir> <tag> [query ...]`
  * (no query names = every declared query). Plans are pre-execution, so
  * AQE nodes print `isFinalPlan=false`; Exchange count, join strategy and
  * PushedFilters/ReadSchema — the facts the round doc cites — are all
  * visible at this stage.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: runMain graft.Plans <sfDir> <outDir> <tag> [query ...]")
      sys.exit(2)
    }
    val Array(sfDir, outDir, tag) = args.take(3)
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, cpus)
    new java.io.File(outDir).mkdirs()
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only).toMap
    only.filterNot(SparkEntry.queries.contains)
      .foreach(n => System.err.println(s"!! unknown query: $n"))
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        // iterative operators localCheckpoint during construction; free
        // their blocks so a multi-query dump doesn't accumulate pressure
        Sessions.releaseCheckpointBlocks(spark)
        println(s"[plans] wrote ${name}_$tag.txt")
      } catch { case scala.util.control.NonFatal(e) =>
        // NonFatal, not Throwable: an OOM/fatal error should kill the
        // dump run loudly, not be logged away as a per-query failure
        System.err.println(s"[plans] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
