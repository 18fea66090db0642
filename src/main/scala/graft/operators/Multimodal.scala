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
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        f(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      f
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
