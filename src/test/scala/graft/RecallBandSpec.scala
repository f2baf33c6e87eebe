package graft

import graft.operators.SimilarityOps

/** Pinned ANN recall floors at the fixture operating point — the same
  * discipline QualityBandSpec applies to topic coherence (reference quality
  * bands: /root/reference/README.md:169-179): `sim_recall`/`sim_ivf_recall`
  * MEASURE recall, but only a floor assertion stops a future
  * band/probe/list knob change from silently trading recall for speed.
  * Floors sit just under the measured values (DEPLOY.md records them) on
  * the fixture's hard near-orthogonal corpus (cos ≈ 0.4–0.6 neighbors —
  * any sub-quadratic index trades recall at that operating point, which is
  * exactly why the floor must be pinned). Both gauges are
  * seeded-deterministic, so the floors are exact regression tripwires.
  */
class RecallBandSpec extends SparkSuite {
  // the correctness-gate scale (sf0.01), where the driver runs the gauges
  private val dir = "/root/testdata/sf0.01"

  private def recalls(df: org.apache.spark.sql.DataFrame): Array[Double] = {
    val rows = try df.collect() finally graft.Caching.releaseAll()
    assert(rows.length == 5) // the probe query set
    rows.map(r => r.getAs[Double]("recall"))
  }

  test("lsh-multiprobe ann holds recall@10 at the fixture operating point") {
    val rs = recalls(SimilarityOps.annRecall(spark, dir))
    val mean = rs.sum / rs.length
    info(f"lsh-multiprobe recall@10: per-query min=${rs.min}%.2f mean=$mean%.2f " +
      s"(index ${SimilarityOps.AnnBands}x${SimilarityOps.AnnBandBits}, Hamming<=2 multiprobe)")
    // measured at this operating point: min 0.50, mean 0.72
    assert(rs.min >= 0.5, s"per-query recall floor broken: ${rs.mkString(",")}")
    assert(mean >= 0.7, s"mean recall floor broken: $mean")
  }

  test("ivf ann holds recall@10 at the fixture operating point") {
    val rs = recalls(SimilarityOps.ivfRecall(spark, dir))
    val mean = rs.sum / rs.length
    info(f"ivf recall@10: per-query min=${rs.min}%.2f mean=$mean%.2f " +
      "(nLists=16, nProbe=4)")
    // measured at this operating point: min 0.30, mean 0.48 — the 4/16-list
    // probe scans 25% of the corpus, and near-orthogonal neighbors spread
    // across lists; nProbe is the recall/speed knob a deployment turns
    assert(rs.min >= 0.3, s"per-query recall floor broken: ${rs.mkString(",")}")
    assert(mean >= 0.45, s"mean recall floor broken: $mean")
  }
}
