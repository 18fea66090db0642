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
}
