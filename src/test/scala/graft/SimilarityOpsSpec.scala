package graft

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
