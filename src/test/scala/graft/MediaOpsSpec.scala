package graft

import graft.multimodal.MediaOps
import graft.multimodal.MediaOps._

/** The multimodal plumbing must be deterministic, partition-invariant, and
  * batch-shaped (codec per partition) — the properties a real codec swap
  * relies on.
  */
class MediaOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val assets = MediaOps.assetsFromDocuments(spark, SparkSpec.FixtureDir)

  test("stub codec: histogram features are normalized and fixed-dim") {
    val f = new StubCodec().features("hello world".getBytes("UTF-8"))
    assert(f.length == FeatureDim)
    assert(math.abs(f.map(_.toDouble).sum - 1.0) < 1e-6)
    val empty = new StubCodec().features(Array.emptyByteArray)
    assert(empty.forall(_ == 0f))
  }

  test("feature extraction covers every asset with unit-ish histograms") {
    val feats = MediaOps.extractFeatures(assets).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.feat_dim == FeatureDim))
    assert(feats.forall(f => f.norm > 0.0 && f.norm <= 1.0))
  }

  test("results are invariant to partitioning (codec-per-partition is pure)") {
    val a = MediaOps.extractFeatures(assets.repartition(1))
      .collect().map(f => (f.asset_id, f.norm)).sortBy(_._1).toSeq
    val b = MediaOps.extractFeatures(assets.repartition(7))
      .collect().map(f => (f.asset_id, f.norm)).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("frame sampling chunks video payloads completely and deterministically") {
    val frames = MediaOps.sampleFrames(assets, frameSize = 100).collect()
    val byAsset = frames.groupBy(_.asset_id)
    val videos = assets.filter(_.kind == "video").collect()
    assert(byAsset.keySet == videos.map(_.asset_id).toSet)
    videos.foreach { v =>
      val fs = byAsset(v.asset_id).sortBy(_.frame_idx)
      assert(fs.map(_.frame_bytes).sum == v.content.length)
      assert(fs.init.forall(_.frame_bytes == 100))
    }
    val again = MediaOps.sampleFrames(assets, frameSize = 100).collect()
    assert(frames.map(f => (f.asset_id, f.frame_idx, f.checksum)).toSet ==
      again.map(f => (f.asset_id, f.frame_idx, f.checksum)).toSet)
  }

  test("media queries return per-kind and per-asset profiles") {
    val prof = MediaOps.mediaFeatureProfile(spark, SparkSpec.FixtureDir).collect()
    assert(prof.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(prof.map(_.getLong(1)).sum == 500)
    assert(MediaOps.mediaFrameProfile(spark, SparkSpec.FixtureDir).count() > 0)
  }
}
