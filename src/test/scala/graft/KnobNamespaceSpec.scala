package graft

/** The per-namespace late-bound-knob contract (VERDICT r16 #6): a
  * dedup-tier face records the corpus-scaled band width it ACTUALLY used
  * under the Artifacts namespace it ran in, so two corpora interleaved in
  * one session (the Verify reality: base faces and `_real` twins share a
  * JVM) each render their own bits into their own oracle SQL — the second
  * corpus can never clobber the first's late-bound rendering.
  *
  * The knob inventory this pins lives in COVERAGE.md ("Late-bound oracle
  * knobs"); any new corpus-derived knob must key by namespace like
  * `dedupBitsByNs` and `balancedCfgByNs` (the last single-corpus-proof
  * holdout, namespace-keyed in r18 when `sim_ivf_balanced_real` landed).
  */
class KnobNamespaceSpec extends SparkSuite {

  import graft.operators.SimilarityOps

  test("interleaved namespaces: each corpus' dedup band bits survive the " +
    "other corpus' faces running after it") {
    val baseDir = SparkSpec.FixtureDir         // sf0.001
    val twinDir = "/root/testdata/sf0.1"       // different cardinality
    // (sf0.01's embeddings table matches sf0.001's 500 rows — only sf0.1
    // crosses the next width decade: 500 → 10 bits, 2000 → 12)
    val nBase = Tables.embeddings(spark, baseDir).count()
    val nTwin = Tables.embeddings(spark, twinDir).count()
    val bitsBase = SimilarityOps.dedupBandBits(nBase)
    val bitsTwin = SimilarityOps.dedupBandBits(nTwin)
    // the contract is only observable when the corpora scale to different
    // widths — true for the shipped fixtures (10 vs 12 bits); if a fixture
    // regen ever equalizes them, widen the gap here rather than pass vacuously
    assert(bitsBase !== bitsTwin,
      s"fixture cardinalities must scale to distinct widths ($bitsBase vs $bitsTwin)")

    // base face in the root namespace …
    Caching.scoped { SimilarityOps.lshDupPairs(spark, baseDir).count() }
    Caching.releaseAll()
    assert(SimilarityOps.dedupBits("") === bitsBase)

    // … then the twin's face under "real/" (the RealisticCorpus.over shape)
    Artifacts.namespaced("real") {
      Caching.scoped { SimilarityOps.lshDupPairs(spark, twinDir).count() }
    }
    Caching.releaseAll()
    assert(SimilarityOps.dedupBits("real/") === bitsTwin)
    assert(SimilarityOps.dedupBits("") === bitsBase,
      "the twin face must not clobber the base namespace's recorded bits")

    // interleave again: base re-runs AFTER the twin — twin's record survives
    Caching.scoped { SimilarityOps.lshDupPairs(spark, baseDir).count() }
    Caching.releaseAll()
    assert(SimilarityOps.dedupBits("real/") === bitsTwin,
      "a later base face must not clobber the twin namespace's recorded bits")
    assert(SimilarityOps.dedupBits("") === bitsBase)
  }

  test("balanced-IVF operating point: the realistic twin's post-split " +
    "config records under its own namespace without clobbering the base") {
    val baseDir = SparkSpec.FixtureDir
    // base face in the root namespace
    Caching.scoped {
      SimilarityOps.ivfRecallBalanced(spark, baseDir).count()
    }
    Caching.releaseAll()
    val baseCfg = SimilarityOps.balancedCfg("")
    assert(baseCfg._1 >= SimilarityOps.IvfLists,
      "splitting can only grow the list count")
    // twin face under "real/" (the RealisticCorpus.over shape): the
    // planted dup family concentrates vector mass, so the fair-share
    // splitter is forced into MORE rounds than the base corpus — the
    // data-dependence that makes a global knob unsound (measured r18:
    // base/twin (43,22)/(69,35) at sf0.001, (46,23)/(54,27) at sf0.01,
    // (32,16)/(62,31) at sf0.1)
    Artifacts.namespaced("real") {
      Caching.scoped {
        SimilarityOps.ivfRecallBalanced(
          spark, RealisticCorpus.ensure(spark, baseDir)).count()
      }
    }
    Caching.releaseAll()
    val twinCfg = SimilarityOps.balancedCfg("real/")
    assert(twinCfg !== baseCfg,
      "the corpora must force distinct operating points for the contract " +
        "to be observable — if a fixture regen equalizes them, replant " +
        "the twin's family mass rather than pass vacuously")
    assert(SimilarityOps.balancedCfg("") === baseCfg,
      "the twin face must not clobber the base namespace's recorded config")
    assert(twinCfg._2 === math.max(1, math.round(
      SimilarityOps.IvfProbe.toDouble * twinCfg._1 / SimilarityOps.IvfLists).toInt),
      "nProbe must scale with the post-split list count (same corpus fraction)")
  }

  test("an unrecorded namespace falls back to the last globally recorded " +
    "width (single-corpus sessions keep the pre-namespace behavior)") {
    val baseDir = SparkSpec.FixtureDir
    Caching.scoped { SimilarityOps.lshDupPairs(spark, baseDir).count() }
    Caching.releaseAll()
    val nBase = Tables.embeddings(spark, baseDir).count()
    assert(SimilarityOps.dedupBits("never-ran/") ===
      SimilarityOps.lastDedupBits)
    assert(SimilarityOps.lastDedupBits === SimilarityOps.dedupBandBits(nBase))
  }
}
