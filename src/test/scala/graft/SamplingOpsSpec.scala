package graft

import org.apache.spark.sql.functions._

import graft.operators.SamplingOps

/** Hash-sampling invariants: selection is a pure function of the id (the
  * property random sampling lacks), splits partition the corpus at the
  * weight ratios, and strata are capped independently.
  */
class SamplingOpsSpec extends SparkSuite {
  import spark.implicits._

  private val ids = spark.range(0, 2000).select(col("id").as("doc_id"))
    .withColumn("lang", when(col("doc_id") % 4 === 0, "ko").otherwise("en"))

  test("hashSample is deterministic and id-stable across frames") {
    val a = SamplingOps.hashSample(ids, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().sorted
    val b = SamplingOps.hashSample(ids.repartition(7), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
    assert(a.length > 0 && a.length < 2000)
  }

  test("fraction 0 keeps nothing, fraction 1 keeps everything") {
    assert(SamplingOps.hashSample(ids, "doc_id", 0.0).count() === 0)
    assert(SamplingOps.hashSample(ids, "doc_id", 1.0).count() === 2000)
  }

  test("assignSplits partitions the corpus near the weight ratios") {
    val counts = SamplingOps.assignSplits(ids, "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 2000)
    assert(counts("train") > 1700 && counts("train") < 1900)
    assert(counts("val") > 50 && counts("val") < 150)
    assert(counts("test") > 50 && counts("test") < 150)
  }

  test("split of a sample equals sample of the split (id-consistency)") {
    // the property that keeps doc/embedding/metadata tables consistent:
    // selection commutes with any other id-preserving operation
    val sampleThenSplit = SamplingOps.assignSplits(
      SamplingOps.hashSample(ids, "doc_id", 0.5), "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1))
      .filter(col("split") === "train")
      .select("doc_id").as[Long].collect().sorted
    val splitThenSample = SamplingOps.hashSample(
      SamplingOps.assignSplits(ids, "doc_id", Seq("train" -> 0.9, "test" -> 0.1))
        .filter(col("split") === "train"), "doc_id", 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(sampleThenSplit.sameElements(splitThenSample))
  }

  test("sampling operators apply unchanged to streaming frames") {
    // stateless narrow ops: the same assignSplits/hashSample run on a
    // stream, and a streamed batch selects exactly the batch-selected rows
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[Long]
    val q = SamplingOps.assignSplits(
      SamplingOps.hashSample(input.toDF().withColumnRenamed("value", "doc_id"),
        "doc_id", 0.5),
      "doc_id", Seq("train" -> 0.9, "test" -> 0.1))
      .writeStream.format("memory").queryName("stream_split").start()
    input.addData(0L until 500L: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_split")
      .select("doc_id", "split").as[(Long, String)].collect().sorted
    val batch = SamplingOps.assignSplits(
      SamplingOps.hashSample(
        spark.range(0, 500).select(col("id").as("doc_id")), "doc_id", 0.5),
      "doc_id", Seq("train" -> 0.9, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().sorted
    assert(streamed.sameElements(batch))
  }

  test("fixedSample pins exactly k rows, stable across partitioning") {
    val a = SamplingOps.fixedSample(ids, "doc_id", 50)
      .select("doc_id").as[Long].collect().sorted
    val b = SamplingOps.fixedSample(ids.repartition(13), "doc_id", 50)
      .select("doc_id").as[Long].collect().sorted
    assert(a.length === 50 && a.sameElements(b))
    // and the plan is a top-k, not a global sort
    val plan = SamplingOps.fixedSample(ids, "doc_id", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("stratifiedSample caps strata independently, default keeps all") {
    val kept = SamplingOps.stratifiedSample(ids, "doc_id", "lang",
      Map("ko" -> 0.2), default = 1.0)
    val byLang = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") === 1500) // default stratum untouched
    assert(byLang("ko") > 50 && byLang("ko") < 150) // 500 * 0.2 ± hash noise
    // kept ko rows are the SAME rows hashSample(0.2) would keep
    val direct = SamplingOps.hashSample(ids.filter(col("lang") === "ko"),
      "doc_id", 0.2).select("doc_id").as[Long].collect().sorted
    val strat = kept.filter(col("lang") === "ko")
      .select("doc_id").as[Long].collect().sorted
    assert(direct.sameElements(strat))
  }

  test("mixToTarget realizes the target token mix; binding domain keeps all") {
    // supplies: ko 5000 tokens (500 docs × 10), en 15000. Target 80/20 the
    // other way makes ko the binding domain: T = 5000/0.8 = 6250, so ko
    // keeps everything and en is cut to ~1250 of its 15000 tokens.
    val docs = ids.withColumn("n_tokens", lit(10L))
    val kept = SamplingOps.mixToTarget(docs, "doc_id", "lang",
      col("n_tokens"), Seq("ko" -> 0.8, "en" -> 0.2))
    val byLang = kept.groupBy("lang")
      .agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("ko") >= 4900, byLang)
    assert(byLang("en") > 800 && byLang("en") < 1700, byLang)
    // realized mix within doc-hash noise of the 80/20 target
    val share = byLang("ko").toDouble / (byLang("ko") + byLang("en"))
    assert(share > 0.74 && share < 0.86, share)
  }

  test("budgetSelect keeps whole best buckets, hash-fills the boundary, drops the rest") {
    // supplies: q=1.0 and q=0.5 each 5000 tokens; budget 7000 → the top
    // bucket fits wholly, the boundary keeps 2000/5000 = 40% by id hash
    val docs = spark.range(0, 1000).select(col("id").as("doc_id"))
      .withColumn("quality", when(col("doc_id") % 2 === 0, 1.0).otherwise(0.5))
      .withColumn("n_tokens", lit(10L))
    val by = SamplingOps.budgetSelect(docs, "doc_id", 7000L)
      .groupBy("quality").agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(by(1.0) === 5000L)
    assert(by(0.5) > 1400 && by(0.5) < 2600, by) // ~2000 ± hash noise
    // a budget below the top bucket's supply drops lower buckets entirely
    val tight = SamplingOps.budgetSelect(docs, "doc_id", 3000L)
      .groupBy("quality").agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(!tight.contains(0.5))
    assert(tight(1.0) > 2400 && tight(1.0) < 3600, tight)
  }

  test("groupFixedSample takes min(k, group size) per group, deterministically") {
    val got = SamplingOps.groupFixedSample(ids, "lang", "doc_id", 100)
    val counts = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("ko" -> 100L, "en" -> 100L)) // both strata > k
    // k above a group's size keeps the whole group
    val all = SamplingOps.groupFixedSample(ids, "lang", "doc_id", 10000)
    assert(all.count() === ids.count())
    // membership is the k smallest hashes per group (brute-force check),
    // stable under physical layout
    val hash = (id: Long) => ((id % 1000000007L) * 8191L + 524287L) % 1000000007L
    val brute = ids.select("doc_id", "lang").as[(Long, String)].collect()
      .groupBy(_._2).toSeq.flatMap { case (_, g) =>
        g.sortBy(r => (hash(r._1), r._1)).take(100).map(_._1) }.toSet
    val a = got.select("doc_id").as[Long].collect().toSet
    val b = SamplingOps.groupFixedSample(ids.repartition(13), "lang", "doc_id", 100)
      .select("doc_id").as[Long].collect().toSet
    assert(a === brute && b === brute)
    // scale shape: the rank filter runs as a window-group-limit (each task
    // keeps <=k rows per group BEFORE the shuffle), not a full group sort
    assert(got.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("leakageSafeSplits: clusters never span splits; singletons = id split") {
    val w = Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05)
    // 2000 docs, every 10 consecutive ids a synthetic near-dup cluster
    val labels = ids.select(col("doc_id"),
      (col("doc_id") - col("doc_id") % 10).as("label"))
    val safe = SamplingOps.leakageSafeSplits(ids, labels, "doc_id", w)
    // no cluster spans two splits
    val spans = safe.groupBy("group_key")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(spans === 0)
    // with no labels at all, the fallback IS the plain id-hash split
    val none = labels.filter(lit(false))
    val fallback = SamplingOps.leakageSafeSplits(ids, none, "doc_id", w)
      .select("doc_id", "split")
    val plain = SamplingOps.assignSplits(ids, "doc_id", w)
      .select("doc_id", "split")
    assert(fallback.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(fallback).count() === 0)
    // fixture face: the naive split DOES strand near-dup docs across the
    // boundary (n_moved > 0) — the operator is non-vacuous there
    val prof = SamplingOps.leakageSafeSplitProfile(spark, SparkSpec.FixtureDir)
      .collect()
    assert(prof.map(_.getLong(1)).sum > 0)
    assert(prof.map(_.getLong(3)).sum > 0)
  }

  test("temperatureRates: alpha<1 up-weights the small domain to rate 1.0") {
    val docs = Seq.fill(90)(("big", 10L)) ++ Seq.fill(10)(("small", 10L))
    val df = docs.toDF("lang", "t")
    val got = SamplingOps.temperatureRates(df, "lang", col("t"), 0.7)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (pBig, qBig, rBig) = got("big")
    val (pSmall, qSmall, rSmall) = got("small")
    // exact hand math: p = .9/.1; q = p^.7 normalized
    val (qb, qs) = (math.pow(0.9, 0.7), math.pow(0.1, 0.7))
    assert(pBig === 0.9 && pSmall === 0.1)
    assert(qBig === math.rint(1e4 * qb / (qb + qs)) / 1e4)
    assert(qSmall === math.rint(1e4 * qs / (qb + qs)) / 1e4)
    // flattening: the small domain keeps everything, the big downsamples
    // to exactly realize q (p_i·rate_i renormalizes to q_i by construction)
    assert(rSmall === 1.0 && rBig < 1.0)
    assert(rBig === math.rint(1e4 * (qb / 0.9) * (0.1 / qs) *
      (qb + qs) / (qb + qs)) / 1e4 ||
      math.abs(rBig - (qb / qs) * (0.1 / 0.9)) < 1e-4)
    // alpha = 1 is the identity: every rate 1.0
    val id = SamplingOps.temperatureRates(df, "lang", col("t"), 1.0)
      .collect().map(_.getDouble(4))
    assert(id.forall(_ === 1.0))
  }

  test("temperatureRates: a zero-supply domain is excluded, not null-rated") {
    val df = (Seq.fill(9)(("big", 10L)) ++ Seq(("empty", 0L), ("small", 10L)))
      .toDF("lang", "t")
    val got = SamplingOps.temperatureRates(df, "lang", col("t"), 0.7)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    // the supply-less domain is not in the plan, and nobody else's rate
    // was poisoned by its p = 0 division
    assert(got.keySet === Set("big", "small"))
    assert(got.values.forall(r => r > 0.0 && r <= 1.0))
    assert(got("small") === 1.0)
  }

  test("domains absent from the mix weights are dropped entirely") {
    val docs = ids.withColumn("n_tokens", lit(10L))
    val kept = SamplingOps.mixToTarget(docs, "doc_id", "lang",
      col("n_tokens"), Seq("ko" -> 1.0))
    assert(kept.filter(col("lang") === "en").count() === 0)
    assert(kept.filter(col("lang") === "ko").count() === 500)
  }

  test("dsirWeights separates a distributionally distinct target domain") {
    // target docs live on buckets {1,2}, out-of-domain docs on {8,9}; a
    // doc written in target vocabulary must outscore one written in the
    // other — the whole point of the estimator. (The fixture's languages
    // share one vocabulary, so the committed face correctly reports NO
    // separation there; this pins that the math separates when the data
    // does.)
    val inst = ((1L to 10L).flatMap(i => Seq(
      (i, "en", 1L, 3L), (i, "en", 2L, 2L))) ++
      (11L to 20L).flatMap(i => Seq(
        (i, "xx", 8L, 3L), (i, "xx", 9L, 2L))))
      .toDF("doc_id", "lang", "b", "n")
    val w = SamplingOps.dsirWeights(inst, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val wEn = (1L to 10L).map(w)
    val wXx = (11L to 20L).map(w)
    assert(wEn.min > wXx.max)
    assert(wEn.forall(_ > 0.0) && wXx.forall(_ < 0.0))
  }

  test("dsir scoring joins the model broadcast, never shuffling the docs side") {
    val plan = SamplingOps.dsirProfile(spark, SparkSpec.FixtureDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the 1024-row lrat model must broadcast to the instance frame")
  }

  test("dsirInstances normalizes before hashing: raw text buckets like " +
    "its normal form") {
    val raw = Seq((1L, "en", "Alpha,  BETA gamma... beta!"))
      .toDF("doc_id", "lang", "text")
    val norm = Seq((1L, "en", "alpha beta gamma beta"))
      .toDF("doc_id", "lang", "text")
    val a = SamplingOps.dsirInstances(raw, "text")
      .collect().map(r => (r.getLong(2), r.getLong(3))).sorted
    val b = SamplingOps.dsirInstances(norm, "text")
      .collect().map(r => (r.getLong(2), r.getLong(3))).sorted
    assert(a.nonEmpty && (a.toSeq === b.toSeq))
  }

  test("dsirWeights is deterministic across partitionings") {
    val inst = (1L to 50L).flatMap(i =>
      Seq((i, "en", i % 7, 1L + i % 3), (i, "xx", i % 11, 2L)))
      .toDF("doc_id", "lang", "b", "n")
    val a = SamplingOps.dsirWeights(inst, col("lang") === "en")
      .collect().map(_.toString).sorted
    val b = SamplingOps.dsirWeights(inst.repartition(13), col("lang") === "en")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
