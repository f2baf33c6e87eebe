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

  test("cross-modal search: 5 probes x top-5 docs, descending cosine, rank exact") {
    val out = MediaOps.mediaTextSearch(spark, SparkSpec.FixtureDir).collect()
    val byA = out.groupBy(_.getAs[Long]("asset_id"))
    assert(byA.keySet == (0L until 5L).toSet)
    byA.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      assert(cs.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    }
  }

  test("orc roundtrip: the sink/source pair loses and corrupts nothing") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, SparkSpec.FixtureDir)
    val out = s"${spark.conf.get("spark.sql.warehouse.dir")}/graft_orc_spec"
    graft.pipeline.OrcIO.writeOrc(docs, out)
    val back = graft.pipeline.OrcIO.readOrc(spark, out, docs.schema)
    assert(back.count() == docs.count())
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty,
      "ORC roundtrip must be row-exact")
  }

  test("csv roundtrip: quote/newline text survives and the cast-back is row-exact") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, SparkSpec.FixtureDir)
    val out = s"${spark.conf.get("spark.sql.warehouse.dir")}/graft_csv_spec"
    graft.pipeline.PreprocessPipeline.writeCsv(docs, out)
    val back = graft.pipeline.PreprocessPipeline.readCsv(spark, out)
      .select(col("doc_id").cast("long"), col("text"), col("lang"),
        col("source"), col("n_chars").cast("long"))
    assert(back.count() == docs.count())
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty,
      "CSV roundtrip must be row-exact incl. the text column")
  }

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

  test("stub codec: gram-window signature is normalized, deterministic, and " +
    "content-sensitive where the byte histogram is not") {
    val codec = new StubCodec
    val a = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val b = "the quick brown fox jumps over the lazy cat".getBytes("UTF-8")
    val sa = codec.signature(a)
    assert(sa.length == SignatureDim)
    assert(math.abs(sa.map(_.toDouble).sum - 1.0) < 1e-5)
    assert(sa.toSeq == codec.signature(a).toSeq)
    // one changed word moves only its 4-gram windows
    val sb = codec.signature(b)
    assert(sa.toSeq != sb.toSeq)
    assert(codec.signature(Array.emptyByteArray).forall(_ == 0f))
    // shorter than one window: all zeros, not a crash
    assert(codec.signature("abc".getBytes("UTF-8")).forall(_ == 0f))
  }

  test("signature corpus is partition-invariant and unit-normalized") {
    val c1 = MediaOps.signatureCorpus(spark, SparkSpec.FixtureDir)
    import graft.functions.HashExpressions.dotK
    import org.apache.spark.sql.functions._
    val norms = c1.select(dotK(col("nv"), col("nv")).as("n2")).collect()
    assert(norms.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
    val a = MediaOps.extractSignatures(assets.repartition(1)).collect()
      .map(s => (s.asset_id, s.sv.toSeq)).sortBy(_._1).toSeq
    val b = MediaOps.extractSignatures(assets.repartition(7)).collect()
      .map(s => (s.asset_id, s.sv.toSeq)).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("media near-dup clusters: every cluster has >= 2 members and every " +
    "member pair reachable through cos >= MediaDupCosine edges") {
    val clusters = MediaOps.mediaDupClusters(spark, SparkSpec.FixtureDir).collect()
    assert(clusters.nonEmpty)
    assert(clusters.forall(_.getLong(1) >= 2))
    // the representative is the cluster min, so rep < max member id
    assert(clusters.forall(r => r.getLong(0) < r.getLong(3)))
  }

  test("media-text alignment covers every asset exactly once, banded") {
    val bands = MediaOps.mediaTextAlign(spark, SparkSpec.FixtureDir).collect()
    assert(bands.map(_.getLong(2)).sum == 500)
    assert(bands.forall { r =>
      val b = r.getInt(1); b >= -10 && b <= 10
    })
  }

  test("media keep-best: one keeper per multi-member cluster, keeper has " +
    "the cluster-max quality, removal counts complete") {
    val kb = MediaOps.mediaKeepBest(spark, SparkSpec.FixtureDir).collect()
    assert(kb.nonEmpty)
    val clusters = MediaOps.mediaDupClusters(spark, SparkSpec.FixtureDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    kb.foreach { r =>
      val (rep, n, keep, rem) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(4))
      assert(clusters.get(rep).contains(n),
        "keep-best clusters must be exactly the multi-member dup clusters")
      assert(rem == n - 1)
      assert(keep >= rep, "the keeper is a member, so id >= the min-id rep")
    }
    assert(kb.length == clusters.size)
  }

  test("decoy successor: two-level shape equals the global lead-with-wrap " +
    "and never windows the id frame unpartitioned") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // gappy, range-boundary-crossing ids: multiples of 7 plus a sparse
    // tail two ranges away — exercises within-range, cross-range, and
    // wraparound successors
    val ids = spark.range(0, 6000, 7).select(col("id").as("doc_id"))
      .union(spark.range(9000, 9003).select(col("id").as("doc_id")))
    val got = MediaOps.nextIdWithWrap(ids)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val want = ids
      .select(col("doc_id"),
        coalesce(lead(col("doc_id"), 1).over(Window.orderBy(col("doc_id"))),
          min(col("doc_id")).over()).as("decoy_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == want)
    // plan shape: the id-frame window must be hash-partitioned by rng —
    // the only unpartitioned window is over the tiny per-range frame
    val plan = MediaOps.nextIdWithWrap(ids).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(rng"),
      "full id frame must cross a rng-partitioned window, not a global sort")
  }

  test("caption gate separates genuine captions from shifted decoys") {
    val gate = MediaOps.mediaCaptionGate(spark, SparkSpec.FixtureDir).collect()
    val nPairs = gate.map(_.getLong(1)).sum
    val keptGenuine = gate.map(_.getLong(4)).sum
    val keptDecoy = gate.map(_.getLong(5)).sum
    assert(nPairs == 500)
    // the filter must actually separate: nearly all genuine pairs pass,
    // nearly all decoys are dropped (fixture-measured: 499 vs 1)
    assert(keptGenuine >= (nPairs * 0.98).toLong)
    assert(keptDecoy <= (nPairs * 0.02).toLong)
  }
}
