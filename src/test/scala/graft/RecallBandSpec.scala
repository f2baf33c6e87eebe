package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps
import graft.functions.VectorFunctions.asDouble
import graft.functions.HashExpressions.unitVector

/** Pinned ANN recall floors at the fixture operating point — the same
  * discipline QualityBandSpec applies to topic coherence (reference quality
  * bands: /root/reference/README.md:169-179): `sim_recall` MEASURES recall,
  * but only a floor assertion stops a future band/probe/list knob change
  * from silently trading recall for speed. Floors sit just under the
  * measured values (DEPLOY.md records them) on the fixture's hard
  * near-orthogonal corpus (cos ≈ 0.4–0.6 neighbors — any sub-quadratic
  * index trades recall at that operating point, which is exactly why the
  * floor must be pinned).
  */
class RecallBandSpec extends SparkSuite {
  // the correctness-gate scale (sf0.01), where the driver runs sim_recall
  private val dir = "/root/testdata/sf0.01"

  test("lsh-multiprobe ann holds recall@10 at the fixture operating point") {
    val rows =
      try SimilarityOps.annRecall(spark, dir).collect()
      finally graft.Caching.releaseAll()
    assert(rows.length == 5) // the probe query set
    val recalls = rows.map(r => r.getAs[Double]("recall"))
    val mean = recalls.sum / recalls.length
    info(f"lsh-multiprobe recall@10: per-query min=${recalls.min}%.2f mean=$mean%.2f " +
      s"(index ${SimilarityOps.AnnBands}x${SimilarityOps.AnnBandBits}, Hamming<=2 multiprobe)")
    // measured at this operating point: min 0.50, mean 0.72 (both sides
    // seeded-deterministic, so the measurement is exactly reproducible)
    assert(recalls.min >= 0.5, s"per-query recall floor broken: ${recalls.mkString(",")}")
    assert(mean >= 0.7, s"mean recall floor broken: $mean")
  }

  test("ivf ann holds recall@10 at the fixture operating point") {
    try testIvf() finally graft.Caching.releaseAll()
  }

  private def testIvf(): Unit = {
    val corpus = graft.Caching.track(Tables.embeddings(spark, dir)
      .select(col("vec_id"), unitVector(asDouble(col("embedding"))).as("nv"),
        col("label")))
    val queries = corpus.filter(col("vec_id") < 5)
    val brute = SimilarityOps.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.ivfTopK(corpus, queries, 10, nLists = 16, nProbe = 4)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val perQuery = brute.groupBy(_._1).map { case (q, rel) =>
      q -> rel.count(ivf.contains).toDouble / rel.size
    }
    val mean = perQuery.values.sum / perQuery.size
    info(f"ivf recall@10: per-query min=${perQuery.values.min}%.2f mean=$mean%.2f " +
      "(nLists=16, nProbe=4)")
    // measured at this operating point: min 0.30, mean 0.48 — the 4/16-list
    // probe scans 25% of the corpus, and near-orthogonal neighbors spread
    // across lists; nProbe is the recall/speed knob a deployment turns
    assert(perQuery.values.min >= 0.3,
      s"per-query recall floor broken: $perQuery")
    assert(mean >= 0.45, s"mean recall floor broken: $mean")
  }
}
