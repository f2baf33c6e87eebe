package graft

/** The per-namespace late-bound-knob contract (VERDICT r16 #6): a
  * dedup-tier face records the corpus-scaled band width it ACTUALLY used
  * under the Artifacts namespace it ran in, so two corpora interleaved in
  * one session (the Verify reality: base faces and `_real` twins share a
  * JVM) each render their own bits into their own oracle SQL — the second
  * corpus can never clobber the first's late-bound rendering.
  *
  * The knob inventory this pins lives in COVERAGE.md ("Late-bound oracle
  * knobs"); any new corpus-derived knob must either key by namespace like
  * `dedupBitsByNs` or prove single-corpus use like `lastBalancedCfg`.
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
