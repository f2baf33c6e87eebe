package graft

import org.apache.spark.sql.functions._

import graft.operators.{PqOps, SimilarityOps}

/** Behavioral tests for the IVF-PQ tier: code-table shape, seeded
  * determinism, and the two-stage search contract. Recall floors live in
  * RecallBandSpec; oracle exactness in the driver gate.
  */
class PqSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.01"

  test("pqFit emits one code per (vector, subspace), cids in range") {
    val corpus = graft.Caching.track(
      SimilarityOps.unitCorpus(Tables.embeddings(spark, dir)))
    try {
      val n = corpus.count()
      val (codebooks, codes, ds) = PqOps.pqFit(corpus)
      assert(ds * PqOps.PqM == 64, "subspaces tile the 64-dim fixture")
      assert(codebooks.count() == PqOps.PqM.toLong * PqOps.PqCents)
      val stats = codes.agg(
        count(lit(1)), countDistinct(col("vec_id"), col("m")),
        min(col("cid")), max(col("cid"))).collect()(0)
      assert(stats.getLong(0) == n * PqOps.PqM, "M codes per vector")
      assert(stats.getLong(1) == n * PqOps.PqM, "no duplicate (vec, m) codes")
      assert(stats.getInt(2) >= 0 && stats.getInt(3) < PqOps.PqCents)
    } finally graft.Caching.releaseAll()
  }

  test("pqFit is deterministic across runs (seeded fits, tie-broken argmin)") {
    val corpus = graft.Caching.track(
      SimilarityOps.unitCorpus(Tables.embeddings(spark, dir)))
    try {
      def codeSet() = {
        val (_, codes, _) = PqOps.pqFit(corpus)
        codes.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      }
      assert(codeSet() == codeSet())
    } finally graft.Caching.releaseAll()
  }

  test("ivfPqAnn returns k contiguous ranks per query with adc + exact cos") {
    val rows = try {
      PqOps.ivfPqAnn(spark, dir).collect()
    } finally graft.Caching.releaseAll()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 50)
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to 3),
        s"query $q ranks not 1..3")
      // ranks order by EXACT cosine after the re-rank — never by adc
      val byRank = rs.sortBy(_.getInt(1)).map(_.getAs[Double]("cos"))
      assert(byRank.sameElements(byRank.sorted.reverse), s"query $q cos order")
      rs.foreach(r => assert(!r.isNullAt(3) && !r.isNullAt(4)))
    }
    // ADC is an approximation of the exact cosine, not a re-statement:
    // over the shortlisted hits the two stay within quantization range
    val err = rows.map(r =>
      math.abs(r.getAs[Double]("adc") - r.getAs[Double]("cos")))
    assert(err.max < 1.0 && err.sum / err.length < 0.5,
      f"adc drifted from cos: mean=${err.sum / err.length}%.3f max=${err.max}%.3f")
  }
}
