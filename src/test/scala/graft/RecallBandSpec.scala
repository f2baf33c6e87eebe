package graft

import graft.operators.{DedupOps, SimilarityOps}

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
      s"(nLists=${SimilarityOps.IvfLists}, nProbe=${SimilarityOps.IvfProbe})")
    // measured at the r10 operating point (32 lists / 16 probes, chosen
    // from the RecallProbe curve in DEPLOY.md): min 0.70, mean 0.76 on the
    // 5-query gauge — up from 0.30/0.48 at the old 16/4 point for ~2.2×
    // the scanned fraction; near-orthogonal neighbors spread across lists,
    // so this is the curve's knee, not a free lunch
    assert(rs.min >= 0.6, s"per-query recall floor broken: ${rs.mkString(",")}")
    assert(mean >= 0.7, s"mean recall floor broken: $mean")
  }

  test("ivf-pq holds both recall gauges at the fixture operating point") {
    val rows = try {
      graft.operators.PqOps.ivfPqRecall(spark, dir).collect()
    } finally graft.Caching.releaseAll()
    assert(rows.length == 5)
    val adc = rows.map(_.getAs[Double]("recall_adc"))
    val rer = rows.map(_.getAs[Double]("recall_rerank"))
    info(f"ivf-pq recall@10: adc min=${adc.min}%.2f mean=${adc.sum / 5}%.2f; " +
      f"reranked min=${rer.min}%.2f mean=${rer.sum / 5}%.2f " +
      s"(pq${graft.operators.PqOps.PqM}x${graft.operators.PqOps.PqCents}, " +
      s"shortlist ${graft.operators.PqOps.PqShortlist}x)")
    // measured at the r10 point (cents=32, shortlist=8, from the
    // RecallProbe sweep in DEPLOY.md): adc min 0.20 mean 0.38, reranked
    // min 0.50 mean 0.70 — the reranked ceiling is the coarse probe's own
    // recall (~0.84 mean at 32/16), so the PQ floors sit under it by the
    // measured ADC-shortlist miss rate, not by quantization alone
    assert(adc.min >= 0.15 && adc.sum / 5 >= 0.3,
      s"adc recall floor broken: ${adc.mkString(",")}")
    assert(rer.min >= 0.5 && rer.sum / 5 >= 0.65,
      s"reranked recall floor broken: ${rer.mkString(",")}")
  }

  test("embed-dedup LSH tier holds pair recall vs the exact cosine twin") {
    // dedup_embed_lsh re-verifies every candidate with the SAME exact
    // cosine threshold as the brute twin, so its pairs are a strict subset
    // of dedup_embed_cosine's — recall is the only quality axis, and this
    // floor stops a band-width knob change from silently trading it away
    // (DEPLOY.md measures the frontier; the gauges above cover the ANN
    // search tiers but left this tier's operating point unasserted).
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val rows = try df.collect() finally graft.Caching.releaseAll()
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val brute = pairSet(DedupOps.embeddingDups(spark, dir)
      .select("vec_a", "vec_b"))
    val lsh = pairSet(SimilarityOps.lshDupPairs(spark, dir)
      .select("vec_a", "vec_b"))
    assert(lsh.subsetOf(brute), "LSH pairs must re-verify to a brute subset")
    val recall = lsh.size.toDouble / brute.size
    info(f"embed-dedup LSH pair recall@cos0.4: $recall%.3f " +
      s"(${lsh.size}/${brute.size}, ${SimilarityOps.DedupBands} bands, " +
      "log2-scaled width)")
    assert(recall >= 0.25, s"pair-recall floor broken: $recall")
  }
}
