package graft

import org.apache.spark.sql.functions.col

import graft.operators.SimilarityOps

/** ANN tiers vs the exact baseline: both approximate indexes must return
  * well-formed rankings whose scores never beat brute force, with usable
  * recall on the fixture.
  */
class SimilarityOpsSpec extends SparkSuite {
  private val dir = SparkSpec.FixtureDir

  private def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("ivf ann: ranked, self-free, never beats brute force, recall@1 bounded") {
    val brute = SparkEntry.queries("sim_topk_brute")(spark, dir).collect()
      .filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val ivf = SimilarityOps.ivfAnn(spark, dir)
    val rows = ivf.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, rk, v, _) => q != v && rk >= 1 && rk <= 3 })
    // per query: ranks are dense from 1 and scores descend
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.size).toSeq)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq)
    }
    // an approximate index can never out-score the exact search (brute
    // covers queries vec_id < 5; ivf covers vec_id < 50 — compare overlap)
    val ivfTop1 = rows.filter(_._2 == 1).map(r => r._1 -> (r._3, r._4)).toMap
    val shared = brute.keySet.intersect(ivfTop1.keySet)
    assert(shared.nonEmpty)
    shared.foreach { q =>
      assert(ivfTop1(q)._2 <= brute(q)._2 + 1e-9, s"query $q: ivf cos beats brute")
    }
    // recall@1 — fraction of the brute-checked queries where the probed
    // lists contained the true nearest neighbor
    val recall = shared.count(q => ivfTop1(q)._1 == brute(q)._1).toDouble /
      math.max(shared.size, 1)
    info(s"ivf recall@1 vs brute on ${shared.size} queries: $recall")
    assert(recall >= 0.2, s"ivf recall collapsed: $recall")
  }

  test("ivf ann is deterministic (seeded quantizer)") {
    val a = SimilarityOps.ivfAnn(spark, dir).collect().map(_.toSeq).toSeq
    val b = SimilarityOps.ivfAnn(spark, dir).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("hard negatives: wrong-label only, ranked, within the probed recall") {
    val dir = SparkSpec.FixtureDir
    val got = SimilarityOps.hardNegatives(spark, dir)
    val labels = SimilarityOps.unitCorpus(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = got.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    // every negative carries a label different from its query's
    assert(rows.forall { case (q, _, v, nl) =>
      labels(v) == nl && nl != labels(q) })
    // ranks are 1..k dense per query
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq === (1 to g.length))
    }
    // the miner never surfaces a pair the exact wrong-label ranking would
    // score higher than its own top hit (cosines are rounded identically)
    val brute = SimilarityOps.bruteForceTopK(
      SimilarityOps.unitCorpus(Tables.embeddings(spark, dir)),
      SimilarityOps.unitCorpus(Tables.embeddings(spark, dir))
        .filter(col("vec_id") < 50), k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .filter { case (q, v, _) => labels(v) != labels(q) }
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._3).max }.toMap
    val gotTop = got.filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(gotTop.forall { case (q, c) => c <= brute(q) + 1e-9 })
  }

  test("ivfIndexBalanced: no-op on a balanced corpus, splits a planted " +
    "hot list under the cap, probe path unchanged") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // no-op path: with the cap above the fixture's worst list, the guard
    // must return the stock index byte-for-byte (the sf0.01 embeddings DO
    // hold one >2x-fair-share list, so the default cap splits even here —
    // natural clustering, not an error; the loose cap isolates the no-op)
    val corpus = SimilarityOps.unitCorpus(Tables.embeddings(spark, dir))
    val (si, sc) = SimilarityOps.ivfIndex(corpus, SimilarityOps.IvfLists)
    val (bi, bc) = SimilarityOps.ivfIndexBalanced(corpus,
      SimilarityOps.IvfLists, maxShare = 16.0)
    assert(bc.count() === sc.count())
    assert(bi.select("vec_id", "list").except(si.select("vec_id", "list"))
      .isEmpty)
    // planted hot mass: 30% of vectors collapse onto vector 0 (+ tiny
    // deterministic jitter) — one list inherits the mass; the guard must
    // bring every list under maxShare fair shares and keep assignments
    // total (every vector in exactly one list)
    val center = corpus.orderBy("vec_id").limit(1)
      .select("nv").collect()(0).getSeq[Double](0).toArray
    val centerLit = array(center.map(lit): _*)
    val hot = corpus.select(col("vec_id"),
      when(col("vec_id") % 10 < 3,
        zip_with(centerLit, sequence(lit(0), lit(center.length - 1)),
          (c, j) => c + lit(0.001) * ((col("vec_id") + j.cast("long")) % 7)))
        .otherwise(col("nv")).as("nv"),
      col("label"))
    val n = hot.count()
    val (hi0, hc) = SimilarityOps.ivfIndex(hot, SimilarityOps.IvfLists)
    val hotMax = hi0.groupBy("list").count().agg(max("count"))
      .collect()(0).getLong(0)
    val cap = math.ceil(2.0 * n.toDouble / SimilarityOps.IvfLists).toLong
    assert(hotMax > cap, s"planting failed: max list $hotMax <= cap $cap")
    val (bi2, bc2) = SimilarityOps.ivfIndexBalanced(hot, SimilarityOps.IvfLists)
    val balMax = bi2.groupBy("list").count().agg(max("count"))
      .collect()(0).getLong(0)
    assert(balMax <= cap, s"guard left an oversized list: $balMax > $cap")
    assert(bi2.count() === n) // assignments stay total
    assert(bi2.select("vec_id").distinct().count() === n) // and unique
    // centroid table matches the live lists exactly (split lists retired)
    val liveLists = bi2.select("list").distinct()
      .collect().map(_.getInt(0)).toSet
    val centLists = bc2.select("list").collect().map(_.getInt(0)).toSet
    assert(liveLists.subsetOf(centLists))
    // the stock probe runs unchanged off the balanced index
    val ann = SimilarityOps.ivfProbe(bi2, bc2,
      hot.filter(col("vec_id") < 5), k = 3, nProbe = SimilarityOps.IvfProbe)
    assert(ann.groupBy("query_id").count().collect()
      .forall(_.getLong(1) === 3L))
    graft.Caching.releaseAll()
  }

  test("ivfIndexBalancedReport: residual names an unsplittable identical-" +
    "vector mass; balanced exits report residual empty") {
    import org.apache.spark.sql.functions._
    // an IDENTICAL-vector mass (zero jitter) cannot be split by KMeans —
    // every sub-fit leaves one child with the parent's full count, so the
    // loop must give up WITHOUT silently looking balanced, and must not
    // burn rounds 2..BalanceRounds re-fitting the provably unsplittable list
    val corpus = SimilarityOps.unitCorpus(Tables.embeddings(spark, dir))
    val center = corpus.orderBy("vec_id").limit(1)
      .select("nv").collect()(0).getSeq[Double](0).toArray
    val centerLit = array(center.map(lit): _*)
    val degenerate = corpus.select(col("vec_id"),
      when(col("vec_id") % 10 < 3, centerLit)
        .otherwise(col("nv")).as("nv"),
      col("label"))
    val n = degenerate.count()
    val cap = math.ceil(2.0 * n.toDouble / SimilarityOps.IvfLists).toLong
    val (_, _, residual) = SimilarityOps.ivfIndexBalancedReport(
      degenerate, SimilarityOps.IvfLists)
    assert(residual.nonEmpty, "identical mass must surface as residual")
    assert(residual.exists(_._2 > cap))
    // a splittable planted mass (jittered) balances: residual empty
    val jittered = corpus.select(col("vec_id"),
      when(col("vec_id") % 10 < 3,
        zip_with(centerLit, sequence(lit(0), lit(center.length - 1)),
          (c, j) => c + lit(0.001) * ((col("vec_id") + j.cast("long")) % 7)))
        .otherwise(col("nv")).as("nv"),
      col("label"))
    val (_, _, res2) = SimilarityOps.ivfIndexBalancedReport(
      jittered, SimilarityOps.IvfLists)
    assert(res2.isEmpty, s"balanced exit must report no residual: ${res2.toSeq}")
    graft.Caching.releaseAll()
  }

  test("hot-bucket cap bounds embed-LSH pair emission on 10k identical vectors") {
    // 10k exact-copy vectors share every band value (the hyperplanes are
    // deterministic), so every band has ONE bucket of 10k members — the
    // uncapped pair face would emit C(10000,2) ≈ 50M candidate rows per
    // band. With the cap each bucket truncates to its `cap` lowest vec_ids
    // and output is exactly C(cap,2); the truncation report names every
    // truncated bucket.
    import org.apache.spark.sql.functions._
    val vec = Array.tabulate(8)(i => 1.0f / (i + 1))
    val viral = spark.range(10000).select(
      col("id").as("vec_id"),
      typedLit(vec).as("embedding"), lit(0).as("label"))
    val corpus = SimilarityOps.withBands(
      viral.select(col("vec_id"),
        graft.functions.HashExpressions.unitVector(
          graft.functions.VectorFunctions.asDouble(col("embedding"))).as("nv"),
        col("label")),
      SimilarityOps.DedupBands, SimilarityOps.DedupBandBits)
    val cap = 32
    val expected = cap.toLong * (cap - 1) / 2
    assert(SimilarityOps.lshCosinePairs(corpus, 0.9, maxBucket = cap).count()
      == expected)
    val rep = SimilarityOps.bucketTruncationReport(corpus, cap).collect()
    assert(rep.length == SimilarityOps.DedupBands)
    assert(rep.forall(r => r.getAs[Long]("n_vecs") == 10000L &&
      r.getAs[Int]("kept") == cap))
    // ...and the shipped cap is not binding on the fixture: the capped
    // query face is bit-equal to the uncapped build there
    val fixture = graft.Tables.embeddings(spark, dir)
    val fcorpus = SimilarityOps.withBands(
      fixture.select(col("vec_id"),
        graft.functions.HashExpressions.unitVector(
          graft.functions.VectorFunctions.asDouble(col("embedding"))).as("nv"),
        col("label")),
      SimilarityOps.DedupBands,
      SimilarityOps.dedupBandBits(fixture.count()))
    assert(SimilarityOps.bucketTruncationReport(fcorpus).count() == 0)
  }
}
