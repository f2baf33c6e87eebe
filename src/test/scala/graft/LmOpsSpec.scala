package graft

import org.apache.spark.sql.functions._

import graft.operators.LmOps

/** The bigram LM must reproduce hand-computed add-alpha probabilities,
  * score unseen continuations through the backoff mass, and keep the
  * self-scoring path exactly on the trained table (empty backoff branch).
  */
class LmOpsSpec extends SparkSuite {
  import spark.implicits._

  // train: one doc "aa bb aa bb" → bigrams (aa bb)×2, (bb aa)×1; V = 2
  // ctx(aa)=2, ctx(bb)=1; alpha 0.5 → denom(aa)=3, denom(bb)=2
  private lazy val train = Seq((1L, "x", "aa bb aa bb")).toDF("doc_id", "lang", "text")
  private lazy val model = LmOps.bigramModel(train, "text", "lang")

  test("trained log-probs match the add-alpha formula") {
    val lp = model.logp.collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    assert(math.abs(lp(("aa", "bb")) - math.log(2.5 / 3.0)) < 1e-12)
    assert(math.abs(lp(("bb", "aa")) - math.log(1.5 / 2.0)) < 1e-12)
    val miss = model.missLogp.collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(math.abs(miss("aa") - math.log(0.5 / 3.0)) < 1e-12)
    assert(math.abs(miss("bb") - math.log(0.5 / 2.0)) < 1e-12)
  }

  test("self-scoring equals the hand-computed mean NLL") {
    val got = LmOps.scoreNll(model, train, "text", "lang", "doc_id")
      .collect()(0).getDouble(2)
    val want = -(2 * math.log(2.5 / 3.0) + math.log(1.5 / 2.0)) / 3.0
    assert(math.abs(got - want) < 1e-12)
  }

  test("unseen continuation takes backoff mass; unseen context the lang floor") {
    val probe = Seq(
      (10L, "x", "aa cc"), // seen context aa, unseen continuation → ln(0.5/3)
      (11L, "x", "cc dd") // unseen context → per-lang floor = min backoff
    ).toDF("doc_id", "lang", "text")
    val got = LmOps.scoreNll(model, probe, "text", "lang", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(got(10L) - -math.log(0.5 / 3.0)) < 1e-12)
    // floor = min(ln(0.5/3), ln(0.5/2)) = ln(0.5/3)
    assert(math.abs(got(11L) - -math.log(0.5 / 3.0)) < 1e-12)
  }

  test("docs in a language the model never saw are dropped, not null-scored") {
    val probe = Seq(
      (30L, "x", "aa bb"), // known lang — scored
      (31L, "qq", "aa bb") // lang absent from the model — dropped
    ).toDF("doc_id", "lang", "text")
    val got = LmOps.scoreNll(model, probe, "text", "lang", "doc_id").collect()
    assert(got.map(_.getLong(0)).toSet === Set(30L))
    assert(got.forall(!_.isNullAt(2)))
  }

  test("cross-corpus scoring exercises the miss path and never emits nulls") {
    val bands = LmOps.crossNllBandsQuery(spark, SparkSpec.FixtureDir).collect()
    assert(bands.nonEmpty)
    // held-out docs WILL contain unseen bigrams — the branch self-scoring
    // can never reach must genuinely fire
    assert(bands.map(_.getLong(4)).sum > 0)
    assert(bands.forall { r =>
      !r.isNullAt(3) && r.getLong(4) <= r.getLong(5) && r.getLong(2) > 0
    })
  }

  test("docs under two tokens are not scored; fixture bands are sane") {
    val probe = Seq((20L, "x", "aa"), (21L, "x", "")).toDF("doc_id", "lang", "text")
    assert(LmOps.scoreNll(model, probe, "text", "lang", "doc_id").count() === 0)
    val bands = LmOps.nllBandsQuery(spark, SparkSpec.FixtureDir).collect()
    assert(bands.nonEmpty)
    assert(bands.forall { r =>
      val band = r.getInt(1); val avg = r.getDouble(3)
      band >= 0 && avg >= band && avg < band + 1 && r.getLong(2) > 0
    })
  }

  test("pplBucketsQuery: terciles partition each lang, sizes within one, " +
    "ranges ordered") {
    val rows = LmOps.pplBucketsQuery(spark, SparkSpec.FixtureDir).collect()
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.nonEmpty)
    byLang.foreach { case (_, rs) =>
      val m = rs.map(r => r.getString(1) ->
        (r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
      assert(m.keySet === Set("head", "middle", "tail"))
      val n = m.values.map(_._1).sum
      // rank-based cuts: at least ⌈n/3⌉ land at or below each threshold
      // (ties can only GROW the lower bucket, never shrink it)
      assert(m("head")._1 >= (n + 2) / 3)
      assert(m("head")._1 + m("middle")._1 >= (2 * n + 2) / 3)
      // value ranges are disjoint and ordered head < middle < tail
      assert(m("head")._3 <= m("middle")._2)
      assert(m("middle")._3 <= m("tail")._2)
    }
  }

  test("pplBucketed: sampled thresholds classify nearly all docs like " +
    "exact ones (the 100 TB protocol)") {
    val exact = LmOps.pplBucketed(spark, SparkSpec.FixtureDir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val sampled = LmOps.pplBucketed(spark, SparkSpec.FixtureDir,
        thresholdFrac = 0.4)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(sampled.keySet === exact.keySet) // thresholds never drop docs
    val agree = exact.count { case (id, b) => sampled(id) == b }
    // cut estimation error only moves docs NEAR a tercile boundary; the
    // bulk classify identically even from a 40% sample
    assert(agree.toDouble / exact.size >= 0.80,
      s"sampled-cut agreement ${agree.toDouble / exact.size}")
    // and the approximation stays a 3-way partition per lang
    assert(sampled.values.toSet.subsetOf(Set("head", "middle", "tail")))
  }

  test("pplBucketed partitions the scored docs: every doc in exactly one " +
    "bucket, per-lang rank bounds hold, on an arbitrary synthetic corpus") {
    val words = Seq("ab", "cd", "ef", "gh", "ij", "kl", "mn")
    def text(id: Long): String =
      (0 until (5 + (id % 7)).toInt)
        .map(i => words(((id * 31 + i * id + i) % 7).toInt)).mkString(" ")
    val rows = (1L to 120L).map { id =>
      (id, text(id), if (id % 3 == 0) "aa" else "bb", "s", 1L)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ppl-prop").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val b = LmOps.pplBucketed(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      // one row per scoreable doc (all 120 have >= 2 tokens)
      assert(b.map(_._1).distinct.length === 120 && b.length === 120)
      b.groupBy(_._2).foreach { case (_, docs) =>
        val n = docs.length
        val byB = docs.groupBy(_._4).view.mapValues(_.length).toMap
        val head = byB.getOrElse("head", 0)
        val mid = byB.getOrElse("middle", 0)
        // rank-based cuts: ties only GROW the lower bucket
        assert(head >= (n + 2) / 3)
        assert(head + mid >= (2 * n + 2) / 3)
        // value ranges ordered: max(head) <= min(middle) <= ... (via nll)
        def rng(k: String) = docs.filter(_._4 == k).map(_._3)
        for ((lo, hi) <- Seq(("head", "middle"), ("middle", "tail")))
          if (rng(lo).nonEmpty && rng(hi).nonEmpty)
            assert(rng(lo).max <= rng(hi).min)
      }
    } finally LmOps.clearNllCache()
  }

  test("pplBucketed: a lang whose docs all miss the threshold sample falls " +
    "back to the pooled cuts instead of silently dropping") {
    import graft.operators.SamplingOps
    // pick ids the 40% hash sample EXCLUDES for the rare lang, and a mix
    // for the bulk lang; write a synthetic documents table
    val candidates = (1L to 400L).toDF("doc_id")
    val kept = SamplingOps.hashSample(candidates, "doc_id", 0.4)
      .collect().map(_.getLong(0)).toSet
    val missed = (1L to 400L).filterNot(kept).take(3)
    assert(missed.size === 3)
    val bulkIds = (1L to 400L).filter(kept).take(30) ++
      (1L to 400L).filterNot(kept).drop(3).take(10)
    val words = Seq("aa", "bb", "cc", "dd", "ee")
    def text(id: Long): String =
      (0 until 8).map(i => words(((id + i * id) % 5).toInt)).mkString(" ")
    val rows = bulkIds.map(id => (id, text(id), "en", "s", 1L)) ++
      missed.map(id => (id, text(id), "zz", "s", 1L))
    val dir = java.nio.file.Files.createTempDirectory("graft-ppl-fb").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val sampled = LmOps.pplBucketed(spark, dir, thresholdFrac = 0.4)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3)))
      // every zz doc is scoreable and must surface, bucketed by the pooled
      // fallback cuts (the pre-r14 inner join lost the whole language)
      val zz = sampled.filter(_._2 == "zz")
      assert(zz.map(_._1).toSet === missed.toSet)
      assert(zz.forall(r => Set("head", "middle", "tail").contains(r._3)))
      // the exact face still buckets zz from its own thresholds
      val exact = LmOps.pplBucketed(spark, dir)
        .collect().filter(_.getString(1) == "zz")
      assert(exact.map(_.getLong(0)).toSet === missed.toSet)
    } finally LmOps.clearNllCache()
  }
}
