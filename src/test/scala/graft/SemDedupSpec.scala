package graft

import graft.operators.SemDedupOps

/** SemDeDup invariants over the fixture: groups are genuine (size ≥ 2),
  * keeper arithmetic is total, and the face is deterministic run to run
  * (the fit is registry-cached and seeded). Exact keeper semantics are
  * pinned by the DuckDB oracle (`dedup_semdedup`).
  */
class SemDedupSpec extends SparkSuite {

  test("semanticDupProfile: group algebra holds and reruns agree") {
    val rows = SemDedupOps.semanticDupProfile(spark, SparkSpec.FixtureDir)
      .collect()
    assert(rows.nonEmpty) // the fixture has cos ≥ 0.4 within-cluster pairs
    rows.foreach { r =>
      val (rep, n, keep, removed) =
        (r.getAs[Number]("group_rep").longValue(),
          r.getAs[Long]("n_vecs"),
          r.getAs[Number]("keep_id").longValue(),
          r.getAs[Long]("n_removed"))
      assert(n >= 2 && removed === n - 1)
      // the propagation label is the component min, so no keeper can
      // precede its group representative
      assert(keep >= rep)
    }
    // each group is reported once, and keepers are distinct docs
    assert(rows.map(_.getAs[Number]("group_rep").longValue()).distinct.length
      === rows.length)
    assert(rows.map(_.getAs[Number]("keep_id").longValue()).distinct.length
      === rows.length)
    val again = SemDedupOps.semanticDupProfile(spark, SparkSpec.FixtureDir)
      .collect().map(_.toString).sorted
    assert(again.sameElements(rows.map(_.toString).sorted))
  }

  test("raising tau only shrinks the duplicate surface") {
    val loose = SemDedupOps.semanticDupProfile(spark, SparkSpec.FixtureDir, 0.35)
      .collect().map(r => r.getAs[Long]("n_vecs")).sum
    val tight = SemDedupOps.semanticDupProfile(spark, SparkSpec.FixtureDir, 0.45)
      .collect().map(r => r.getAs[Long]("n_vecs")).sum
    assert(loose >= tight)
  }

  test("plan shape: no single-partition exchange or global sort funnel") {
    // both faces rank/aggregate within cluster-partitioned frames; a
    // refactor that drops the partition key would surface here
    for (q <- Seq(
      SemDedupOps.semanticDupProfile(spark, SparkSpec.FixtureDir),
      SemDedupOps.prototypesProfile(spark, SparkSpec.FixtureDir))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange SinglePartition"),
        "cluster-scoped work must never funnel through one partition")
    }
  }

  test("prototypesProfile: prune counts follow the rate, cut below ceiling") {
    val rows = SemDedupOps.prototypesProfile(spark, SparkSpec.FixtureDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, pruned) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_pruned"))
      assert(pruned === math.floor(n * SemDedupOps.PrototypePruneRate).toLong)
      assert(pruned < n) // a cluster never prunes itself empty at 25%
      // the kept mean sits at or below the cut: pruning removed the top
      assert(r.getAs[Double]("avg_kept_cos") <= r.getAs[Double]("cut_cos"))
    }
    // rate 0 prunes nothing
    val all = SemDedupOps.prototypesProfile(spark, SparkSpec.FixtureDir, 0.0)
      .collect()
    assert(all.forall(_.getAs[Long]("n_pruned") === 0L))
  }
}
