package graft.warehouse

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Columnar (ORC) handoff: typed round-trip including array columns,
  * the same manifest contract as the JSONL export, and the properties
  * that make the tree cheap to read back — partition pruning from the
  * dir layout, predicate pushdown from the sorted file stats.
  */
class InterchangeSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 30L).map { i =>
    (i, s"document number $i", Array.tabulate(4)(d => (i + d).toFloat),
      if (i % 3 == 0) "de" else "en",
      if (i % 5 == 0) "val" else "train")
  }.toDF("doc_id", "text", "vec", "lang", "split")

  test("columnarShards: typed roundtrip, manifest exact, record bound holds") {
    val dst = java.nio.file.Files.createTempDirectory("orc_export").toString
    val manifest = Export.columnarShards(docs, dst, maxRecordsPerFile = 4)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val expected = docs.groupBy($"split", $"lang").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(manifest.view.mapValues(_._2).toMap === expected)
    manifest.foreach { case (part, (shards, records)) =>
      assert(records <= shards * 4, s"$part: $records records in $shards shards")
    }
    assert(new java.io.File(s"$dst/split=train/lang=en").isDirectory)
    // typed roundtrip: longs stay longs, float arrays survive bit-exactly
    val back = spark.read.orc(dst)
      .select($"doc_id", $"text", $"vec", $"lang", $"split")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2).toList,
        r.getString(3), r.getString(4))).toSet
    val orig = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2).toList,
        r.getString(3), r.getString(4))).toSet
    assert(back === orig)
  }

  test("read-back plans prune partitions and push predicates into the ORC scan") {
    val dst = java.nio.file.Files.createTempDirectory("orc_plan").toString
    Export.columnarShards(docs, dst, maxRecordsPerFile = 100)
    val pruned = spark.read.orc(dst).filter($"split" === "train")
    val prunedPlan = pruned.queryExecution.executedPlan.toString
    assert(prunedPlan.contains("PartitionFilters") &&
      prunedPlan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*split[^\\]]*\\].*"),
      s"partition filter missing from:\n$prunedPlan")
    // the data predicate must reach the ORC scan as a pushed filter
    val pushed = spark.read.orc(dst).filter($"doc_id" < 5)
    val pushedPlan = pushed.queryExecution.executedPlan.toString
    assert(pushedPlan.contains("PushedFilters") &&
      pushedPlan.replaceAll("\\s+", " ")
        .matches(".*PushedFilters: \\[[^\\]]*LessThan\\(doc_id,5\\)[^\\]]*\\].*"),
      s"doc_id predicate not pushed in:\n$pushedPlan")
    // and the pruned read returns exactly the train rows
    assert(pruned.count() === docs.filter($"split" === "train").count())
  }
}
