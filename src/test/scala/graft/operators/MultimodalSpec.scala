package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private def assets = Seq(
    Asset(1L, "image", Array.fill[Byte](130)(7)),
    Asset(2L, "audio", Array.fill[Byte](64)(1)),
    Asset(3L, "video", Array[Byte](42)),
  ).toDS()

  test("extractFeatures keeps schema, byte counts, frame math") {
    val got = extractFeatures(assets).collect().map(f => f.asset_id -> f).toMap
    assert(got(1L).n_bytes === 130L && got(1L).n_frames === 3) // ceil(130/64)
    assert(got(2L).n_frames === 1)
    assert(got(3L).n_frames === 1) // min 1 frame even for tiny payloads
    assert(got(1L).features.length === FakeDecoder.FeatureDim)
    // deterministic: all-sevens payload -> first bucket accumulates 17 bytes
    assert(math.abs(got(1L).features(0) - 17 * 7 / 255.0f) < 1e-4)
  }

  test("sampleFrameIndexes strides over derived frame counts") {
    val got = sampleFrameIndexes(assets.toDF(), stride = 2)
      .filter($"asset_id" === 1L).select($"frame_idx")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(0, 2)) // frames 0..2, stride 2
  }

  test("end-to-end: decoded features feed cosine top-k like any embedding") {
    import graft.functions.vectors
    // documents-as-blobs through the REAL typed decode stage
    val corpus = graft.Tables(spark, sf, "documents")
      .select($"doc_id".as("asset_id"), lit("text/plain").as("media_type"),
        $"text".cast("binary").as("payload"))
      .as[Multimodal.Asset]
    val feats = Multimodal.extractFeatures(corpus)
      .select($"asset_id",
        vectors.toDoubleArray($"features").as("v"))
      .localCheckpoint()
    val query = feats.filter($"asset_id" === 0L).select($"v".as("qv"))
    val topk = feats.join(org.apache.spark.sql.functions.broadcast(query))
      .filter($"asset_id" =!= 0L)
      .select($"asset_id",
        round(vectors.cosineSimilarity($"v", $"qv"), 6).as("cos"))
      .orderBy($"cos".desc, $"asset_id")
      .limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // driver recompute from the same FakeDecoder, plain Scala
    val raw = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> Multimodal.FakeDecoder.features(
        r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val q0 = raw(0L)
    val expected = raw.toSeq.filter(_._1 != 0L)
      .map { case (id, f) =>
        (id, BigDecimal(cos(q0, f)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c) => (-c, id) }.take(5)
    assert(topk.toSeq === expected)
  }

  test("mediaNearDupPairs and mediaClusters match a sequential recount") {
    // sequential reference: same decoder, same centering, same plane
    // scheme (8 bands x the auto width for this corpus size), all-pairs
    // — affordable at sf0.001
    val raw = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> Multimodal.FakeDecoder.features(
        r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val rw = Similarity.autoPlanesPerBand(raw.length.toLong)
    val centered = raw.map { case (id, f) =>
      val d = f.map(_.toDouble)
      val mean = d.reduceLeft(_ + _) / 8.0
      id -> d.map(_ - mean)
    }.filter { case (_, v) => v.map(x => x * x).sum > 0 }.sortBy(_._1)
    def sig(v: Array[Double], band: Int): Int =
      (0 until rw).map { k =>
        val j = band * rw + k
        val dot = (0 until 8).map(d =>
          v(d) * Similarity.planeComponent(j, d)).sum
        if (dot > 0) 1 << k else 0
      }.sum
    val sigs = centered.map { case (id, v) =>
      id -> (0 until 8).map(b => sig(v, b)) }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = (0 until 8).map(i => a(i) * b(i)).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (for {
      (a, va) <- centered; (b, vb) <- centered if a < b
      if (0 until 8).exists(band => sigs(a)(band) == sigs(b)(band))
      c = r4(cos(va, vb)) if c >= 0.8
    } yield (a, b, c)).sortBy(p => (p._1, p._2)).toSeq
    val got = Multimodal.mediaNearDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "degenerate test: no media near-dup pairs at sf0.001")
    // clusters: connected components over those pairs, canonical min id
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    expected.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = expected.flatMap(p => Seq(p._1, p._2)).distinct
    val expClusters = members.map(m => (m, find(m))).sortBy(_._1)
    val gotClusters = Multimodal.mediaClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotClusters === expClusters)

    // survivor selection: largest payload per cluster, min-id ties
    val byteLen = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length.toLong)
      .toMap
    val expBest = expClusters.groupBy(_._2).toSeq.map { case (canon, ms) =>
      val ids = ms.map(_._1)
      val best = ids.maxBy(id => (byteLen(id), -id))
      (canon, best, ids.length.toLong, byteLen(best))
    }.sortBy(_._1)
    val gotBest = Multimodal.mediaDedupBest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotBest === expBest)

    // recall audit cross-check: with nProbes covering every doc at this
    // SF, truth = all-pairs cos >= 0.8 and caught = the pair generator's
    // output (candidates ∩ truth) — so the audit's totals must reconcile
    // exactly with the two frames already recounted above
    val truthAll = (for {
      (a, va) <- centered; (b, vb) <- centered if a < b
      c = r4(cos(va, vb)) if c >= 0.8
    } yield (a, b, c)).toSeq
    val audit = Multimodal.mediaLshRecall(spark, sf, nProbes = 100000).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(audit.map(_._2).sum === truthAll.length.toLong)
    assert(audit.map(_._3).sum === expected.length.toLong)
    audit.foreach { case (_, nTrue, nCaught, recall) =>
      assert(nCaught <= nTrue)
      assert(recall ===
        BigDecimal(nCaught.toDouble / nTrue)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }

    // multi-probe dominates single-probe bucket-for-bucket (a superset
    // of candidates can only catch more), same truth totals
    val mp = Multimodal.mediaLshRecall(spark, sf, nProbes = 100000,
        multiProbe = true).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(mp.map(_._2).sum === truthAll.length.toLong)
    val singleByBucket = audit.map(a => a._1 -> a._3).toMap
    mp.foreach { case (bucket, nTrue, nCaught) =>
      assert(nCaught >= singleByBucket(bucket),
        s"bucket $bucket: multi-probe caught less than single-probe")
      assert(nCaught <= nTrue)
    }
  }
}
