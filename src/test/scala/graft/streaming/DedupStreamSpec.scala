package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

object DedupStreamSpec {
  case class Doc(doc_id: Long, text: String, ts: Timestamp)
  case class Vec(vec_id: Long, embedding: Array[Float], ts: Timestamp)
}

/** Streaming LSH dedup: candidates fire the moment a near-dup arrives,
  * buckets expire past the retention horizon, and — the load-bearing
  * claim — the stream's candidate set agrees with the batch LSH pair
  * generator on identical data (same md5 seed scheme end to end).
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._
  import StatefulDedup._
  import DedupStreamSpec.Doc

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup
    (4L, "completely different content about spark engines"))

  test("arriving duplicate emits a candidate against the seen corpus, once seen") {
    val input = MemoryStream[Doc](spark)
    val q = dupCandidates(
        banded(input.toDF().withWatermark("ts", "10 minutes")),
        retentionMs = 60 * 60 * 1000)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    input.addData(
      Doc(1L, corpus(0)._2, ts("2024-01-01 09:00:00")),
      Doc(4L, corpus(3)._2, ts("2024-01-01 09:01:00")))
    q.processAllAvailable()
    val before = spark.table("dedup_out").count()
    input.addData(Doc(2L, corpus(1)._2, ts("2024-01-01 09:05:00")))
    q.processAllAvailable()
    val rows = spark.table("dedup_out").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    q.stop()
    assert(before === 0L, "no pair may fire before a duplicate exists")
    assert(rows.contains((2L, 1L)), s"dup must pair against the indexed doc: $rows")
    assert(!rows.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc paired")
  }

  test("buckets expire past the retention horizon") {
    val input = MemoryStream[Doc](spark)
    val q = dupCandidates(
        banded(input.toDF().withWatermark("ts", "10 minutes")),
        retentionMs = 60 * 60 * 1000)
      .writeStream.format("memory").queryName("dedup_exp")
      .outputMode(OutputMode.Append).start()
    input.addData(Doc(1L, corpus(0)._2, ts("2024-01-01 09:00:00")))
    q.processAllAvailable()
    // push the watermark far past 09:00 + 1h retention: bucket expires
    input.addData(Doc(4L, corpus(3)._2, ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    // the same text again — its bucket is gone, so nothing to pair with
    input.addData(Doc(2L, corpus(1)._2, ts("2024-01-01 12:55:00")))
    q.processAllAvailable()
    val rows = spark.table("dedup_exp").count()
    q.stop()
    assert(rows === 0L, "expired bucket must not produce pairs")
  }

  test("stream candidates equal the batch LSH pair generator on the same corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("dedupstream").toString
    corpus.map { case (id, t) => (id, t, "en", "a", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val batchPairs = Dedup.minhashLshPairs(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val input = MemoryStream[Doc](spark)
    val q = dupCandidates(
        banded(input.toDF().withWatermark("ts", "10 minutes")),
        retentionMs = 24 * 60 * 60 * 1000)
      .writeStream.format("memory").queryName("dedup_agree")
      .outputMode(OutputMode.Append).start()
    input.addData(corpus.zipWithIndex.map { case ((id, t), i) =>
      Doc(id, t, ts(f"2024-01-01 09:${i}%02d:00")) }: _*)
    q.processAllAvailable()
    val streamPairs = spark.table("dedup_agree").collect()
      .map(r => (math.min(r.getLong(1), r.getLong(2)),
        math.max(r.getLong(1), r.getLong(2)))).toSet
    q.stop()
    assert(streamPairs === batchPairs,
      s"stream $streamPairs must equal batch $batchPairs")
  }

  test("uniquePairsSink stores each pair exactly once, equal to the batch pair set") {
    val tmp = java.nio.file.Files.createTempDirectory("dedupuniq").toString
    corpus.map { case (id, t) => (id, t, "en", "a", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val batchPairs = Dedup.minhashLshPairs(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.nonEmpty)

    val store = java.nio.file.Files.createTempDirectory("pairstore").toString + "/pairs"
    val input = MemoryStream[Doc](spark)
    val q = uniquePairsSink(
        banded(input.toDF().withWatermark("ts", "10 minutes")),
        retentionMs = 24 * 60 * 60 * 1000, store)
      .start()
    // two micro-batches, second re-sends doc 2's text as doc 2 again via
    // a near-identical doc 5 — multi-band agreement + cross-batch both
    // exercised against the store's exactly-once guarantee
    input.addData(corpus.zipWithIndex.map { case ((id, t), i) =>
      Doc(id, t, ts(f"2024-01-01 09:${i}%02d:00")) }: _*)
    q.processAllAvailable()
    input.addData(Doc(5L, corpus(0)._2, ts("2024-01-01 09:30:00")))
    q.processAllAvailable()
    // at-least-once redelivery of an ALREADY-INDEXED doc: the re-emitted
    // candidate carries flipped orientation (redelivered doc becomes
    // new_doc) — the unordered store key must still dedup it
    input.addData(Doc(1L, corpus(0)._2, ts("2024-01-01 09:31:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(store).collect()
      .map(r => (r.getAs[Long]("new_doc"), r.getAs[Long]("index_doc")))
    // UNIQUE: one stored row per pair (the raw candidate stage emits one
    // per agreeing band — exact dups agree on all 4)
    assert(rows.length === rows.distinct.length,
      s"duplicate pair rows survived: ${rows.toSeq}")
    val normalized = rows.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val batchWith5 = batchPairs ++ Set((1L, 5L), (2L, 5L), (3L, 5L))
    assert(normalized === batchWith5,
      s"stream $normalized must equal batch-with-arrival $batchWith5")
  }

  test("embedding stream candidates equal the batch band self-join on the same vectors") {
    // deterministic 8-dim-ish vectors padded to 64 dims; a few near-parallel
    val mk: (Long, Double) => (Long, Array[Float]) = (id, tilt) =>
      id -> Array.tabulate(64)(d => (math.sin(d * 0.3) + tilt * d / 64.0).toFloat)
    val vecs = Seq(mk(1L, 0.0), mk(2L, 0.01), mk(3L, 0.02), mk(4L, 5.0), mk(5L, 5.01))
    import org.apache.spark.sql.functions.col
    val batchFrame = vecs.toDF("vec_id", "v")
      .select(col("vec_id"), graft.functions.vectors.toDoubleArray(col("v")).as("v"))
    val bands = graft.operators.Similarity.bandedPlaneBuckets(batchFrame, 4, 24)
    val batchCand = bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchCand.nonEmpty)

    val input = MemoryStream[DedupStreamSpec.Vec](spark)
    val q = dupCandidates(
        bandedEmbeddings(input.toDF().withWatermark("ts", "10 minutes")),
        retentionMs = 24 * 60 * 60 * 1000)
      .writeStream.format("memory").queryName("emb_stream")
      .outputMode(OutputMode.Append).start()
    input.addData(vecs.zipWithIndex.map { case ((id, v), i) =>
      DedupStreamSpec.Vec(id, v, ts(f"2024-01-01 09:${i}%02d:00")) }: _*)
    q.processAllAvailable()
    val streamCand = spark.table("emb_stream").collect()
      .map(r => (math.min(r.getLong(1), r.getLong(2)),
        math.max(r.getLong(1), r.getLong(2)))).toSet
    q.stop()
    assert(streamCand === batchCand,
      s"stream $streamCand must equal batch $batchCand")
  }

  test("embedding stream probe against the stored index equals the batch incremental generator") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val sfDir = sf
    val batchPred = col("vec_id") % 4 === 3
    // same stored index + scheme the batch incremental probe uses
    // (r = auto of the corpus size = 4 at this SF)
    val index = Similarity.embeddingBandIndexFor(spark, sfDir, batchPred, 4, 24)
    val corpus = graft.Tables(spark, sfDir, "embeddings")
    val expected = Similarity.incrementalEmbeddingPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty)

    val probes = corpus.filter(batchPred)
      .select("vec_id", "embedding").collect()
      .map(r => DedupStreamSpec.Vec(r.getLong(0),
        r.getSeq[Float](1).toArray, ts("2024-01-01 09:00:00")))
    val outDir = java.nio.file.Files
      .createTempDirectory("emb_probe_store").toString + "/pairs"
    val input = MemoryStream[DedupStreamSpec.Vec](spark)
    val q = Streams.embeddingIndexProbeSink(input.toDF(), index, corpus, outDir)
      .start()
    // two batches + a replay of the first: the store must end exact
    val (b1, b2) = probes.splitAt(probes.length / 2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    input.addData(b1: _*); q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected,
      s"stream store (${got.size}) must equal batch pairs (${expected.size})")
  }

  test("keywordServeSink: streamed top-k equals batch keywordSearchIndexed " +
       "per query, replays never duplicate a result set") {
    import org.apache.spark.sql.functions.col
    import graft.operators.TextOps
    val queries = Seq(
      (1L, Seq("vector", "hash", "spark")),
      (2L, Seq("vector")),
      (3L, Seq("hash", "spark")))
    val outDir = java.nio.file.Files
      .createTempDirectory("kw_serve_store").toString + "/topk"
    val input = MemoryStream[(Long, Seq[String])](spark)
    val q = Streams.keywordServeSink(
      input.toDF().toDF("query_id", "terms"), sf, outDir).start()
    val (b1, b2) = queries.splitAt(2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    input.addData(b1: _*); q.processAllAvailable() // replay
    q.stop()
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    var total = 0
    queries.foreach { case (qid, terms) =>
      val rows = got.filter(_._1 == qid).sortBy(_._2).toSeq
      val exp = TextOps.keywordSearchIndexed(spark, sf, terms, k = 25)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getLong(1)) }.toSeq
      assert(rows === exp, s"query $qid stream/batch drift")
      assert(exp.nonEmpty, s"query $qid matched nothing — vacuous")
      total += exp.length
    }
    assert(got.length === total) // replay added nothing
  }

  test("ivfServeSink: streamed cell-routed top-k equals batch ivfTopKIndexed " +
       "per query, replays never duplicate a result set") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val corpus = graft.Tables(spark, sf, "embeddings")
    val probes = corpus.filter(col("vec_id") < 3)
      .select("vec_id", "embedding").collect()
      .map(r => DedupStreamSpec.Vec(r.getLong(0),
        r.getSeq[Float](1).toArray, ts("2024-01-01 09:00:00")))
    val outDir = java.nio.file.Files
      .createTempDirectory("ivf_serve_store").toString + "/topk"
    val input = MemoryStream[DedupStreamSpec.Vec](spark)
    val q = Streams.ivfServeSink(input.toDF(), sf, outDir).start()
    val (b1, b2) = probes.splitAt(2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    input.addData(b1: _*); q.processAllAvailable() // replay
    q.stop()
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    var total = 0
    probes.map(_.vec_id).foreach { qid =>
      val rows = got.filter(_._1 == qid).sortBy(_._2).toSeq
      val exp = Similarity.ivfTopKIndexed(spark, sf, queryId = qid, k = 5)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getDouble(2)) }.toSeq
      assert(rows === exp, s"query $qid stream/batch IVF drift")
      assert(exp.nonEmpty, s"query $qid empty cell — vacuous")
      total += exp.length
    }
    assert(got.length === total) // replay added nothing
  }

  test("pqServeSink: streamed ADC top-k equals batch pqTopKIndexed per query, " +
       "replays never duplicate a query's result set") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val corpus = graft.Tables(spark, sf, "embeddings")
    val probes = corpus.filter(col("vec_id") < 3)
      .select("vec_id", "embedding").collect()
      .map(r => DedupStreamSpec.Vec(r.getLong(0),
        r.getSeq[Float](1).toArray, ts("2024-01-01 09:00:00")))
    val outDir = java.nio.file.Files
      .createTempDirectory("pq_serve_store").toString + "/topk"
    val input = MemoryStream[DedupStreamSpec.Vec](spark)
    val q = Streams.pqServeSink(input.toDF(), sf, outDir).start()
    val (b1, b2) = probes.splitAt(2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    input.addData(b1: _*); q.processAllAvailable() // replay
    q.stop()
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    probes.map(_.vec_id).foreach { qid =>
      val rows = got.filter(_._1 == qid).sortBy(_._2).toSeq
      val exp = Similarity.pqTopKIndexed(spark, sf, queryId = qid, k = 10)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getLong(1)) }.toSeq
      assert(rows === exp, s"query $qid stream/batch ADC drift")
    }
    assert(got.length === probes.length * 10) // replay added nothing
  }

  test("streaming semantic-decon gate: train vectors flag against the eval-split index") {
    import org.apache.spark.sql.functions.{broadcast, col, round}
    import graft.operators.{Similarity, TextOps}
    import graft.functions.vectors
    // the gate is a pure composition: the SAME probe sink, pointed at an
    // index built from the EVAL split — arriving train vectors that band-
    // collide with a held-out doc and verify above threshold are leaks
    val evalPred = TextOps.hashBucket(col("vec_id"), "split:") >= 90
    val trainPred = TextOps.hashBucket(col("vec_id"), "split:") < 80
    val index = Similarity.embeddingBandIndexByPred(spark, sf, evalPred, 4, 24)
    val corpus = graft.Tables(spark, sf, "embeddings")
    // batch expectation from the same pieces the sink composes
    val ed = corpus.select(col("vec_id"),
      vectors.toDoubleArray(col("embedding")).as("v"))
    val trainBands = Similarity.bandedPlaneBuckets(ed.filter(trainPred), 4, 24)
    val expected = trainBands.alias("p")
      .join(index.alias("i"),
        col("p.band") === col("i.band") && col("p.sig") === col("i.sig"))
      .select(col("p.vec_id").as("new_vec"), col("i.vec_id").as("index_vec"))
      .distinct()
      .join(ed.select(col("vec_id").as("new_vec"), col("v").as("va")), "new_vec")
      .join(broadcast(ed.select(col("vec_id").as("index_vec"), col("v").as("vb"))),
        "index_vec")
      .select(col("new_vec"), col("index_vec"),
        round(vectors.cosineSimilarity(col("va"), col("vb")), 4).as("cs"))
      .filter(col("cs") >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty, "fixture should contain at least one train-side leak")

    val probes = corpus.filter(trainPred)
      .select("vec_id", "embedding").collect()
      .map(r => DedupStreamSpec.Vec(r.getLong(0),
        r.getSeq[Float](1).toArray, ts("2024-01-01 09:00:00")))
    val outDir = java.nio.file.Files
      .createTempDirectory("sem_gate_store").toString + "/flags"
    val input = MemoryStream[DedupStreamSpec.Vec](spark)
    val q = Streams.embeddingIndexProbeSink(input.toDF(), index, corpus, outDir)
      .start()
    input.addData(probes.take(probes.length / 2): _*); q.processAllAvailable()
    input.addData(probes.drop(probes.length / 2): _*); q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
  }

  test("a doc arriving far behind the watermark expires quietly, not as a query crash") {
    val input = MemoryStream[Doc](spark)
    val q = dupCandidates(
        banded(input.toDF().withWatermark("ts", "10 minutes")),
        retentionMs = 60 * 60 * 1000)
      .writeStream.format("memory").queryName("dedup_late")
      .outputMode(OutputMode.Append).start()
    // advance the watermark to ~12:50
    input.addData(Doc(4L, corpus(3)._2, ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    // >1h (the retention) behind the watermark: the un-clamped timeout
    // (09:00 + 1h < watermark) used to throw inside the state handler
    // and kill the whole query
    input.addData(Doc(1L, corpus(0)._2, ts("2024-01-01 09:00:00")))
    q.processAllAvailable()
    assert(q.exception.isEmpty,
      s"late arrival must not crash the query: ${q.exception}")
    q.stop()
  }
}
