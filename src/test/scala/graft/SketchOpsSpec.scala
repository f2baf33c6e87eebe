package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchOps

/** Count-min sketch invariants: estimates upper-bound true counts, the
  * sketch is a fixed-size mergeable grid, and building it per shard then
  * summing equals building it whole.
  */
class SketchOpsSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    "spark join spark filter", "join join scan", "spark window filter scan")
    .toDF("text")

  test("estimate >= true count for every probed word; exact absent collisions") {
    val sketch = SketchOps.countMinSketch(docs, "text")
    val words = Seq("spark", "join", "scan", "missing").toDF("w")
    val est = SketchOps.countMinEstimate(sketch, words, "w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("spark") >= 3L && est("join") >= 3L && est("scan") >= 2L)
    // width 1024 vs 6 distinct words: collisions are absent, so exact
    assert(est("spark") === 3L && est("join") === 3L && est("scan") === 2L)
    assert(est("missing") === 0L)
  }

  test("sketch size is depth x occupied-buckets, independent of corpus size") {
    val sketch = SketchOps.countMinSketch(docs, "text", depth = 4, width = 64)
    assert(sketch.count() <= 4L * 64)
    assert(sketch.select("row").distinct().count() === 4)
  }

  test("sharded sketches merge by cellwise addition") {
    val whole = SketchOps.countMinSketch(docs, "text")
    val sharded = SketchOps.countMinSketch(docs.limit(1), "text")
      .unionByName(SketchOps.countMinSketch(
        docs.except(docs.limit(1)), "text"))
      .groupBy("row", "bucket").agg(sum("n").as("n"))
    val a = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = sharded.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("linear counting estimates distinct words within a few percent") {
    val row = SketchOps.distinctSketch(spark, SparkSpec.FixtureDir).collect()(0)
    val (exact, est) = (row.getLong(0), row.getDouble(2))
    assert(est >= exact * 0.95 && est <= exact * 1.10,
      s"estimate $est too far from exact $exact")
  }

  test("occupancy bitmaps merge by union") {
    val whole = SketchOps.occupiedBuckets(docs, "text")
      .collect().map(_.getLong(0)).toSet
    val sharded = SketchOps.occupiedBuckets(docs.limit(1), "text")
      .collect().map(_.getLong(0)).toSet ++
      SketchOps.occupiedBuckets(docs.except(docs.limit(1)), "text")
        .collect().map(_.getLong(0)).toSet
    assert(whole === sharded)
  }

  test("query shape: top-10 words with est >= freq") {
    val rows = SketchOps.countMinTopWords(spark, SparkSpec.FixtureDir).collect()
    assert(rows.length === 10)
    assert(rows.forall(r => r.getLong(2) >= r.getLong(1)))
  }

  test("histogram quantile estimates land within one bucket width of truth") {
    // uniform 1..1000: true pN = 10·N, width 10 -> estimate error < 10
    val vals = spark.range(1, 1001).select(col("id").as("v"))
    val sketch = SketchOps.histogramSketch(vals, "v", 10)
    val est = SketchOps.quantileEstimates(sketch, 10, Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(est(0.5) - 500.0) <= 10.0)
    assert(math.abs(est(0.9) - 900.0) <= 10.0)
    assert(math.abs(est(0.99) - 990.0) <= 10.0)
  }

  test("histogram sketches merge by cellwise addition") {
    val vals = spark.range(1, 1001).select(col("id").as("v"))
    val whole = SketchOps.histogramSketch(vals, "v", 10)
    val merged = SketchOps.histogramSketch(vals.filter(col("v") <= 400), "v", 10)
      .unionByName(SketchOps.histogramSketch(vals.filter(col("v") > 400), "v", 10))
      .groupBy("bucket").agg(sum("n").as("n"))
    val a = whole.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    // and the merged sketch reads the same quantiles
    val qa = SketchOps.quantileEstimates(whole, 10, Seq(0.5)).collect()(0).getDouble(1)
    val qb = SketchOps.quantileEstimates(merged, 10, Seq(0.5)).collect()(0).getDouble(1)
    assert(qa === qb)
  }

  // ------------------------------------------------------------ HyperLogLog

  /** The engine's affine key hash (SamplingOps family) for numeric ids. */
  private def affineHash = expr(s"((id % ${SketchOps.P}) * 8191 + 524287) % ${SketchOps.P}")

  test("HLL raw branch lands within ~3σ of 50k true distinct keys") {
    // 50k distinct hashes fill all 1024 registers (zeros = 0), forcing the
    // harmonic branch; HLL standard error is 1.04/sqrt(1024) ≈ 3.25%
    val keys = spark.range(50000).select(affineHash.as("h"))
    val row = SketchOps.hllEstimate(SketchOps.hllRegisters(keys, "h")).collect()(0)
    val (occupied, est) = (row.getLong(0), row.getDouble(1))
    assert(occupied === 1024L, "50k keys should hit every register")
    assert(math.abs(est - 50000.0) / 50000.0 <= 0.10,
      s"HLL estimate $est more than 10% from 50000")
  }

  test("HLL registers merge by bucket-wise max; estimate unchanged") {
    val keys = spark.range(20000).select(affineHash.as("h"))
    val whole = SketchOps.hllRegisters(keys, "h")
    val merged = SketchOps.hllRegisters(keys.limit(8000), "h")
      .unionByName(SketchOps.hllRegisters(
        keys.except(keys.limit(8000)), "h"))
      .groupBy("bucket").agg(max("r").as("r"))
    val a = whole.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = merged.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
  }

  test("HLL register count is bounded by m regardless of input size") {
    val keys = spark.range(200000).select(affineHash.as("h"))
    assert(SketchOps.hllRegisters(keys, "h", m = 256).count() <= 256L)
  }

  test("HLL fixture query fires the small-range correction near-exactly") {
    // 30 distinct words << 2.5m -> linear-counting branch; at this
    // occupancy linear counting is near-exact
    val row = SketchOps.hllDistinct(spark, SparkSpec.FixtureDir).collect()(0)
    val (exact, est) = (row.getLong(0), row.getDouble(2))
    assert(est >= exact * 0.9 && est <= exact * 1.15,
      s"small-range estimate $est too far from exact $exact")
  }

  test("grouped HLL: each group's estimate equals its standalone sketch") {
    val rows = SketchOps.hllByLang(spark, SparkSpec.FixtureDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(rows.size >= 2)
    // per-group estimates behave like independent sketches: at fixture
    // cardinality each fires the near-exact linear-counting branch
    rows.foreach { case (lang, (exact, est)) =>
      assert(est >= exact * 0.9 && est <= exact * 1.15,
        s"lang=$lang estimate $est too far from exact $exact")
    }
  }

  test("incremental HLL equals the whole-corpus sketch exactly (lossless merge)") {
    val whole = SketchOps.hllDistinct(spark, SparkSpec.FixtureDir).collect()(0)
    val inc = SketchOps.hllIncremental(spark, SparkSpec.FixtureDir).collect()(0)
    assert(inc.getLong(0) === whole.getLong(0))   // n_exact
    assert(inc.getLong(1) === whole.getLong(1))   // occupied
    assert(inc.getDouble(2) === whole.getDouble(2)) // est — bit-identical
  }

  // --------------------------------------------------------- heavy hitters

  test("sketch-pruned heavy hitters equal the exact HAVING query") {
    val brute = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pruned = SketchOps.heavyHitters(docs, "text", 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pruned === brute)
    // upper-bound guarantee: a narrow sketch (forced collisions) may admit
    // more candidates but NEVER loses a true heavy hitter
    val narrow = SketchOps.heavyHitters(docs, "text", 2L, depth = 2, width = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(narrow === brute)
  }

  test("heavy-hitter cell filter prunes non-candidate occurrences map-side") {
    // one dominant word among many singletons: the heavy-cell array keeps
    // only cells the dominant word (plus collisions) touches
    val skew = (Seq.fill(50)("dominant word here") ++
      (1 to 40).map(i => s"rare$i token$i")).toDF("text")
    val hh = SketchOps.heavyHitters(skew, "text", 40L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh === Map("dominant" -> 50L, "word" -> 50L, "here" -> 50L))
  }

  // ---------------------------------------------------------- bloom filter

  test("bloom semi-join equals the plain semi-join, even when tiny bitsets force false positives") {
    val big = spark.range(2000).select(col("id").as("k"), (col("id") % 7).as("v"))
    val small = spark.range(100).select((col("id") * 19 + 3).as("sk"))
    val exact = big.join(small, big("k") === small("sk"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    val viaBloom = SketchOps.bloomSemiJoin(big, small, "k", "sk")
      .collect().map(_.getLong(0)).toSet
    assert(viaBloom === exact)
    // 64-bit filter saturates -> many false positives; exact verification
    // still returns precisely the true matches
    val saturated = SketchOps.bloomSemiJoin(big, small, "k", "sk", mBits = 64, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(saturated === exact)
  }

  test("bloom prefilter has no false negatives and the exact verify broadcasts") {
    val q = SketchOps.bloomSemiQuery(spark, SparkSpec.FixtureDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "bloom survivors should verify via a broadcast semi-join")
    assert(!plan.contains("SortMergeJoin"),
      "the big side must never shuffle into a sort-merge join")
  }
}
