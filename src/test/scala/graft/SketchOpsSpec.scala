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
}
