package graft.warehouse

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExportSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 30L).map { i =>
    (i, s"document number $i", if (i % 3 == 0) "de" else "en",
      if (i % 5 == 0) "val" else "train")
  }.toDF("doc_id", "text", "lang", "split")

  test("shards are partition-foldered, record-bounded, and roundtrip exactly") {
    val dst = java.nio.file.Files.createTempDirectory("export").toString
    val manifest = Export.trainingShards(docs, dst, maxRecordsPerFile = 4)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // every (split, lang) combination present with the right record count
    val expected = docs.groupBy($"split", $"lang").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(manifest.view.mapValues(_._2).toMap === expected)
    // record bound holds per shard: shards × bound covers the partition
    manifest.foreach { case (part, (shards, records)) =>
      assert(records <= shards * 4, s"$part: $records records in $shards shards")
    }
    // hive-style partition dirs, not flat files
    assert(new java.io.File(s"$dst/split=train/lang=en").isDirectory)
    // JSON payload roundtrips every column exactly
    val back = spark.read.text(dst)
      .select($"split", $"lang",
        from_json($"value",
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, text STRING")).as("j"))
      .select($"j.doc_id", $"j.text", $"lang", $"split")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    val orig = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(back === orig)
  }

  test("manifest never rescans the written payload") {
    val dst = java.nio.file.Files.createTempDirectory("export-plan").toString
    val manifest = Export.trainingShards(docs, dst, maxRecordsPerFile = 4)
    // the manifest plan must not contain ANY file scan of the output dir
    // (the old implementation re-read every JSONL line — 2x export I/O)
    val plan = manifest.queryExecution.executedPlan.toString
    assert(!plan.contains(dst), s"manifest plan reads back the output:\n$plan")
    // and it still reconciles: listing-derived shard counts x bound
    // cover the input-derived record counts
    manifest.collect().foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) * 4)
      assert(r.getLong(2) >= 1L)
    }
  }

  test("curriculumShards: stage dirs + file order replay curriculumOrder") {
    val dst = java.nio.file.Files.createTempDirectory("export-curr").toString
    val docsTmp = java.nio.file.Files.createTempDirectory("export-curr-src").toString
    // varied lengths so several length-doubling stages exist
    val cdocs = (1L to 30L).map { i =>
      (i, ("tok " * i.toInt).trim + s" d$i", "en")
    }.toDF("doc_id", "text", "lang")
    cdocs.withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$docsTmp/documents.parquet")
    // record bound of 3 forces split files inside a stage
    val manifest = Export.curriculumShards(cdocs, dst, maxRecordsPerFile = 3)
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(manifest.values.map(_._2).sum === cdocs.count())
    assert(manifest.exists(_._2._2 > 3), "fixture too small to force file splits")
    manifest.foreach { case (st, (shards, records)) =>
      assert(records <= shards * 3, s"stage $st record bound broken")
    }
    // the schedule the layout claims to implement
    val expected = graft.operators.TextOps.curriculumOrder(spark, docsTmp)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(manifest.keySet === expected.keySet)
    assert(expected.size > 1, "single-stage fixture is vacuous")
    expected.foreach { case (st, ids) =>
      val dir = new java.io.File(s"$dst/stage=$st")
      val files = dir.listFiles().filter(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith(".")).sortBy(_.getName)
      val got = files.flatMap { f =>
        scala.io.Source.fromFile(f).getLines().map { line =>
          "\"doc_id\":(\\d+)".r.findFirstMatchIn(line).get.group(1).toLong
        }
      }.toSeq
      assert(got === ids, s"stage $st order mismatch")
    }
  }

  test("orderedTrainingShards: files replay the trainingOrder permutation verbatim") {
    val dst = java.nio.file.Files.createTempDirectory("export-ord").toString
    val docsTmp = java.nio.file.Files.createTempDirectory("export-ord-src").toString
    docs.withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$docsTmp/documents.parquet")
    // record bound of 3 forces multiple split files per shard, so the
    // name-ordered concatenation must still replay the permutation
    val manifest = Export.orderedTrainingShards(docs, dst, nShards = 4,
        maxRecordsPerFile = 3)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(manifest.values.sum === docs.count())
    assert(manifest.exists(_._2 > 3), "fixture too small to force file splits")
    // expected order from the operator the layout claims to implement
    val expected = graft.operators.TextOps.trainingOrder(spark, docsTmp, nShards = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // read each shard dir file-by-file, lines in file order
    (0 until 4).foreach { sh =>
      val dir = new java.io.File(s"$dst/shard=$sh")
      if (expected.contains(sh)) {
        val files = dir.listFiles().filter(f => f.isFile && !f.getName.startsWith("_")
          && !f.getName.startsWith(".")).sortBy(_.getName)
        val got = files.flatMap { f =>
          scala.io.Source.fromFile(f).getLines().map { line =>
            "\"doc_id\":(\\d+)".r.findFirstMatchIn(line).get.group(1).toLong
          }
        }.toSeq
        assert(got === expected(sh), s"shard $sh order mismatch")
      }
    }
  }

  test("manifest keeps partitions with null/empty partition values") {
    val dst = java.nio.file.Files.createTempDirectory("export-nullpart").toString
    val withNullLang = docs.withColumn("lang",
      when($"doc_id" % 3 === 0, lit(null: String)).otherwise($"lang"))
    val manifest = Export.trainingShards(withNullLang, dst, maxRecordsPerFile = 100)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3)))
    // every record accounted for — the null-lang rows land in the Hive
    // default partition and must NOT vanish from the manifest
    assert(manifest.map(_._2).sum === withNullLang.count())
    assert(manifest.exists(_._1._2 == null),
      s"null-lang partition missing from manifest: ${manifest.toSeq}")
  }

  test("null payload fields survive the JSON round-trip explicitly") {
    val dst = java.nio.file.Files.createTempDirectory("export-null").toString
    val withNulls = docs.withColumn("text",
      when($"doc_id" % 7 === 0, lit(null: String)).otherwise($"text"))
    Export.trainingShards(withNulls, dst, maxRecordsPerFile = 100)
    // ignoreNullFields=false: the field must be PRESENT as a JSON null,
    // not omitted — readers see every field on every row
    val rawNullRows = spark.read.text(dst)
      .filter($"value".contains("\"text\":null")).count()
    assert(rawNullRows === withNulls.filter($"text".isNull).count())
  }
}
