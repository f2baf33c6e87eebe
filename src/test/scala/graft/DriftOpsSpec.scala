package graft

import org.apache.spark.sql.functions._

import graft.operators.DriftOps

/** Corpus-comparison invariants: JS divergence symmetry/zero/known-value,
  * and the corpus MinHash signature's mergeability + estimate behavior on
  * identical and disjoint token sets.
  */
class DriftOpsSpec extends SparkSuite {
  import spark.implicits._

  private def dist(texts: String*) =
    DriftOps.wordDist(texts.toDF("text"), "text")

  test("JS contributions: zero on identical distributions, symmetric, finite one-sided") {
    val a = dist("spark join filter", "spark scan")
    val b = dist("spark join filter", "spark scan")
    val zero = DriftOps.jsContributions(a, b).collect()
    assert(zero.nonEmpty && zero.forall(_.getDouble(3) === 0.0))

    val c = dist("spark join window window")
    val ab = DriftOps.jsContributions(a, c)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val ba = DriftOps.jsContributions(c, a)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(ab === ba, "JS is symmetric")
    // 'window' exists only in c; its contribution is finite and positive
    assert(ab("window") > 0 && !ab("window").isInfinite)
  }

  test("JS matches the hand-computed value on a two-point distribution") {
    // a = {x: 1.0}, b = {x: 0.5, y: 0.5}:
    //   js(x) = (1*log2(1/0.75) + 0.5*log2(0.5/0.75)) / 2 ≈ 0.0612781
    //   js(y) = (0.5*log2(0.5/0.25)) / 2 = 0.25
    val a = dist("xx")
    val b = dist("xx yy")
    val js = DriftOps.jsContributions(a, b)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(js("xx") - 0.061278) < 1e-6)
    assert(js("yy") === 0.25)
  }

  test("corpus signatures merge: sig(A ∪ B) = seed-wise min of sig(A), sig(B)") {
    val ha = spark.range(1000).select((col("id") * 7919 + 13).as("h"))
    val hb = spark.range(1000).select((col("id") * 104729 + 7).as("h"))
    val merged = DriftOps.signatureOf(ha.unionByName(hb).distinct())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mins = DriftOps.signatureOf(ha)
      .withColumnRenamed("mn", "mn_a")
      .join(DriftOps.signatureOf(hb).withColumnRenamed("mn", "mn_b"), "seed")
      .select(col("seed"), least(col("mn_a"), col("mn_b")).as("mn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === mins)
  }

  test("sketch estimate: 1.0 on identical sets, 0 matches on disjoint sets") {
    val ha = spark.range(500).select((col("id") * 31 + 1).as("h"))
    val same = DriftOps.signatureOf(ha).withColumnRenamed("mn", "mn_a")
      .join(DriftOps.signatureOf(ha).withColumnRenamed("mn", "mn_b"), "seed")
      .filter(col("mn_a") === col("mn_b")).count()
    assert(same === 32L)
    val hb = spark.range(500).select((col("id") * 31 + 1000000).as("h"))
    val disjoint = DriftOps.signatureOf(ha).withColumnRenamed("mn", "mn_a")
      .join(DriftOps.signatureOf(hb).withColumnRenamed("mn", "mn_b"), "seed")
      .filter(col("mn_a") === col("mn_b")).count()
    assert(disjoint === 0L)
  }

  test("PSI: zero on identical histograms, nonnegative always, grows with shift") {
    import graft.operators.SketchOps
    val a = SketchOps.histogramSketch(
      spark.range(1, 1001).select(col("id").as("v")), "v", 100)
    val same = DriftOps.psiContributions(a, a).collect()
    assert(same.nonEmpty && same.forall(_.getDouble(3) === 0.0))
    // shifted distribution: every contribution (p-q)ln(p/q) is >= 0 and
    // the total registers the shift
    val b = SketchOps.histogramSketch(
      spark.range(401, 1401).select(col("id").as("v")), "v", 100)
    val drifted = DriftOps.psiContributions(a, b).collect()
    assert(drifted.forall(_.getDouble(3) >= 0.0))
    assert(drifted.map(_.getDouble(3)).sum > 0.2, "a 40% shift reads as significant")
  }

  test("fixture queries: drift rows ranked, resemblance gauge coherent") {
    val drift = DriftOps.driftQuery(spark, SparkSpec.FixtureDir).collect()
    assert(drift.length === 15)
    assert(drift.map(_.getDouble(3)).sliding(2).forall(p => p(0) >= p(1)),
      "drift rows ordered by contribution")
    val r = DriftOps.resemblanceQuery(spark, SparkSpec.FixtureDir).collect()(0)
    val (jExact, jEst) = (r.getDouble(0), r.getDouble(1))
    assert(jExact >= 0.0 && jExact <= 1.0 && jEst >= 0.0 && jEst <= 1.0)
    assert(math.abs(jEst - jExact) <= 0.35, // ~2σ at k=32
      s"sketch estimate $jEst too far from exact $jExact")
  }
}
