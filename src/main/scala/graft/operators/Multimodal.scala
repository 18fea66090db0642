package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus decode /
  * feature-extract / frame-sample stages.
  *
  * The decode step itself is STUBBED (no codec libraries in this
  * container) with a deterministic fake — `FakeDecoder` below — but the
  * Spark-side contract is real and tested: schema, batch shape,
  * partition-parallel execution via mapPartitions over Dataset rows, and
  * the metadata arithmetic that the oracle checks (octet lengths, chunk
  * counts).
  *
  * At 100 TB: binary payloads stay columnar in parquet; decode runs
  * per-partition (one codec init per partition, not per row); feature
  * vectors come back as array<float> ready for graft.operators.Similarity.
  */
object Multimodal {

  /** Typed row for a multimodal asset. */
  case class Asset(asset_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features for one asset. */
  case class AssetFeatures(asset_id: Long, media_type: String,
                           n_bytes: Long, n_frames: Int,
                           features: Array[Float])

  /** Deterministic fake decoder: stands in for an image/audio codec.
    * Deliberately cheap and reproducible — byte histogram moments as the
    * "feature vector", byte-length-derived "frame" count. Swap this object
    * for a real codec binding in production; everything around it stays.
    */
  object FakeDecoder {
    val FrameBytes = 64
    val FeatureDim = 8

    def nFrames(payload: Array[Byte]): Int =
      math.max(1, (payload.length + FrameBytes - 1) / FrameBytes)

    def features(payload: Array[Byte]): Array[Float] = {
      // integer byte sums first, ONE float division at the end: integer
      // sums are exact in any engine at any order, so the feature vector
      // is engine-portable (a float += accumulation would make the value
      // depend on summation order — the fixed-point discipline of the
      // kmeans trainer, applied to the decoder)
      val sums = new Array[Long](FeatureDim)
      var i = 0
      while (i < payload.length) {
        sums(i % FeatureDim) += (payload(i) & 0xff)
        i += 1
      }
      Array.tabulate(FeatureDim)(j => (sums(j) / 255.0).toFloat)
    }
  }

  /** Decode + feature-extract stage: partition-parallel, codec state
    * initialised once per partition (the `decoder` val inside the
    * closure), rows streamed — the shape a real binding needs.
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { rows =>
      val decoder = FakeDecoder // real impl: init codec/session here
      rows.map { a =>
        AssetFeatures(a.asset_id, a.media_type,
          a.payload.length.toLong,
          decoder.nFrames(a.payload),
          decoder.features(a.payload))
      }
    }
  }

  /** Frame sampling: keep every `stride`-th frame index of an asset —
    * pure-expression generator, no decode needed for the index plan.
    */
  def sampleFrameIndexes(assets: DataFrame, stride: Int): DataFrame =
    assets
      .withColumn("n_frames",
        greatest(ceil(octet_length(col("payload")) / FakeDecoder.FrameBytes.toDouble), lit(1)).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))

  /** Frame-sampling stats over documents-as-blobs (UTF-8 bytes as the
    * payload): every doc's stride-4 sampled frame count via the REAL
    * sequence-explode generator, which the SQL oracle cross-checks
    * against the closed-form (n_frames + 3) / 4 — so the generator
    * arithmetic itself is what's verified.
    */
  /** Default frame-sampling stride; shared with the SQL oracle. */
  val DefaultStride = 4

  def frameSampleStats(s: SparkSession, dir: String,
                       stride: Int = DefaultStride): DataFrame = {
    import s.implicits._
    val assets = Tables(s, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    sampleFrameIndexes(assets, stride)
      .groupBy($"doc_id", $"n_frames")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy($"doc_id")
  }

  /** Decoded-feature vectors ready for similarity search: documents-as-
    * blobs through the REAL typed decode stage ([[extractFeatures]]),
    * then per-vector mean-centering. Centering matters for sign-LSH:
    * raw byte-histogram features are all-positive and near-parallel, so
    * every vector lands in the same handful of sign buckets (measured:
    * 1-4 distinct signatures per band uncentered vs 14+ centered); the
    * centered vector's signs carry the doc's SHAPE, not its magnitude.
    * The mean is an explicit left-to-right 8-term sum so an external
    * engine reproduces it bit-for-bit.
    */
  def mediaFeatureVectors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables(s, dir, "documents")
      .select($"doc_id".as("asset_id"), lit("text/plain").as("media_type"),
        $"text".cast("binary").as("payload")).as[Asset]
    val vd = graft.functions.vectors.toDoubleArray(col("features"))
    val mean = (0 until FakeDecoder.FeatureDim)
      .map(i => col("vd").getItem(i)).reduce(_ + _) /
      FakeDecoder.FeatureDim.toDouble
    extractFeatures(assets).toDF()
      .select($"asset_id".as("vec_id"), vd.as("vd"))
      .select($"vec_id", transform($"vd", x => x - mean).as("v"))
  }

  /** Media near-dup: decoded feature vectors through the same banded
    * sign-LSH + exact-cosine-verify path as the text embeddings
    * (`Similarity.bandedPairsCore`) — the image-dedup operator a
    * multimodal corpus runs before training. Band width defaults to the
    * same `autoPlanesPerBand` discipline as the embedding path (4 at the
    * oracle SFs — the value the SQL oracle hardcodes — wider at stress
    * sizes), so expected bucket occupancy stays constant and candidate
    * mass ~linear as the corpus grows; the price is recall at wider r,
    * the standard LSH trade the embedding recall audits quantify.
    * Zero-vectors (uniform payloads) are dropped on both engine and
    * oracle sides before banding.
    */
  def mediaNearDupPairs(s: SparkSession, dir: String,
                        threshold: Double = 0.8,
                        planesPerBand: Int = Similarity.AutoPlanes,
                        nBands: Int = 8): DataFrame = {
    import s.implicits._
    val feats = mediaFeatureVectors(s, dir)
      .filter(graft.functions.vectors.dot($"v", $"v") > 0)
    // width sized from the ASSET count (a metadata-cheap parquet count),
    // not a decode pass over the payloads
    val r = if (planesPerBand > 0) planesPerBand
            else Similarity.autoPlanesPerBand(Tables(s, dir, "documents").count())
    Similarity.bandedPairsCore(feats, threshold, r, nBands,
        FakeDecoder.FeatureDim, multiProbe = false)
      .select($"vec_a".as("asset_a"), $"vec_b".as("asset_b"), $"cos_sim")
  }

  /** Recall audit for the media LSH — the decoded-media twin of
    * `Similarity.embeddingLshRecall`, over the same centered feature
    * vectors and band scheme as [[mediaNearDupPairs]]: per similarity
    * bucket, what fraction of TRUE near-dups the bucket join catches.
    * This is the measurement that justifies (and bounds) the adaptive
    * band width at scale.
    */
  def mediaLshRecall(s: SparkSession, dir: String, threshold: Double = 0.8,
                     planesPerBand: Int = Similarity.AutoPlanes,
                     nBands: Int = 8, nProbes: Int = 100,
                     multiProbe: Boolean = false): DataFrame = {
    import s.implicits._
    val feats = mediaFeatureVectors(s, dir)
      .filter(graft.functions.vectors.dot($"v", $"v") > 0)
    val r = if (planesPerBand > 0) planesPerBand
            else Similarity.autoPlanesPerBand(Tables(s, dir, "documents").count())
    Similarity.lshRecallCore(feats, threshold, r, nBands,
      FakeDecoder.FeatureDim, nProbes, multiProbe)
  }

  /** Near-dup clusters over the media feature space — the decoded-media
    * twin of `Similarity.embeddingClusters`, riding the same
    * connected-components path over [[mediaNearDupPairs]].
    */
  def mediaClusters(s: SparkSession, dir: String,
                    threshold: Double = 0.8,
                    planesPerBand: Int = Similarity.AutoPlanes,
                    nBands: Int = 8): DataFrame = {
    import s.implicits._
    // localCheckpoint: dedupClusters unions the pair frame with its own
    // flip before materializing edges — un-checkpointed, the decode +
    // banding + exact-cosine verify pipeline would execute twice
    Similarity.embeddingClusters(s,
        mediaNearDupPairs(s, dir, threshold, planesPerBand, nBands)
          .select($"asset_a".as("vec_a"), $"asset_b".as("vec_b"))
          .localCheckpoint())
      .select($"vec_id".as("asset_id"), $"canon_id")
  }

  /** Survivor selection for media clusters — the media twin of
    * `Dedup.dedupBest`, with the media-native quality signal: keep the
    * LARGEST payload per cluster (for real assets, bytes ≈ resolution/
    * fidelity — dedup should keep the best copy, not the earliest id),
    * min-id ties. Same partial-aggregatable `max(struct)` argmax as the
    * text path: one shuffle on canon_id, no window sort.
    */
  def mediaDedupBest(s: SparkSession, dir: String,
                     threshold: Double = 0.8): DataFrame = {
    import s.implicits._
    val bytes = Tables(s, dir, "documents")
      .select($"doc_id".as("asset_id"),
        octet_length($"text").cast("long").as("n_bytes"))
    mediaClusters(s, dir, threshold)
      .join(bytes, Seq("asset_id"))
      .groupBy($"canon_id")
      .agg(count(lit(1)).as("n_members"),
        max(struct($"n_bytes", (-$"asset_id").as("neg_id"))).as("m"))
      .select($"canon_id", (-$"m.neg_id").as("best_id"), $"n_members",
        $"m.n_bytes".as("n_bytes"))
      .orderBy($"canon_id")
  }

  /** Oracle-checkable metadata path over documents-as-blobs: byte length
    * (octet_length = UTF-8 bytes) and 64-byte chunk counts per lang. This
    * exercises the same arithmetic the binary pipeline uses, on data the
    * SQL oracle can see.
    */
  def blobMetadata(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", $"lang", octet_length($"text").cast("long").as("n_bytes"))
      .withColumn("n_chunks", ceil($"n_bytes" / FakeDecoder.FrameBytes.toDouble).cast("long"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_bytes").as("sum_bytes"),
        max($"n_bytes").as("max_bytes"),
        sum($"n_chunks").as("sum_chunks"))
      .orderBy($"lang")
  }
}
