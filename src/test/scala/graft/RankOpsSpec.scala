package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.RankOps

/** Broadcast-CDF order statistics vs Spark's own ANSI windows: the
  * histogram formulation must equal `percent_rank`/`cume_dist`/median
  * exactly (ties, even/odd groups, nulls), while never sorting the data —
  * only the distinct-value frame.
  */
class RankOpsSpec extends SparkSuite {
  import spark.implicits._

  // Heavy ties (values 0..19 over 500 rows) — the regime where naive
  // rank-from-row-number formulations break.
  private lazy val rows = spark.range(0, 500)
    .select(col("id").as("doc_id"), (col("id") % 20).as("v"))

  test("rankByCdf equals ANSI percent_rank and cume_dist under ties") {
    val got = RankOps.rankByCdf(rows, "v")
    val want = rows
      .withColumn("pr", percent_rank().over(Window.orderBy("v")))
      .withColumn("cd", cume_dist().over(Window.orderBy("v")))
    val joined = got.join(want, "doc_id")
      .filter(abs(col("pct_rank") - col("pr")) > 1e-12 ||
        abs(col("cume_dist") - col("cd")) > 1e-12)
    assert(joined.count() === 0)
  }

  test("rankByCdf drops null values and handles a single-value column") {
    val withNulls = rows
      .withColumn("v", when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("v")))
    assert(RankOps.rankByCdf(withNulls, "v").count() ===
      withNulls.filter(col("v").isNotNull).count())
    val one = Seq(1, 1, 1).toDF("v").withColumn("doc_id", monotonically_increasing_id())
    val r = RankOps.rankByCdf(one, "v").select("pct_rank", "cume_dist").distinct().collect()
    assert(r.length === 1 && r(0).getDouble(0) === 0.0 && r(0).getDouble(1) === 1.0)
  }

  test("groupedMedian matches Spark median() for odd, even, and tied groups") {
    val df = Seq(
      ("a", 1), ("a", 3), ("a", 5), // odd → 3
      ("b", 1), ("b", 2), ("b", 3), ("b", 10), // even → 2.5
      ("c", 7), ("c", 7), ("c", 7), ("c", 9), // ties → 7
      ("d", 4) // singleton → 4
    ).toDF("k", "v")
    val got = RankOps.groupedMedian(df, "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 3.0, "b" -> 2.5, "c" -> 7.0, "d" -> 4.0))
    val ansi = df.groupBy("k").agg(median(col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === ansi)
  }

  test("groupedQuantiles equals Spark's exact percentile aggregate") {
    val df = Seq(
      ("a", 1), ("a", 2), ("a", 3), ("a", 10), // interpolation between gaps
      ("b", 5), ("b", 5), ("b", 5), ("b", 7), ("b", 9), // heavy ties
      ("c", 4) // singleton
    ).toDF("k", "v")
    val qs = Seq("q0" -> 0.0, "q25" -> 0.25, "q50" -> 0.5,
      "q90" -> 0.9, "q100" -> 1.0)
    val got = RankOps.groupedQuantiles(df, "k", "v", qs)
      .collect().map(r => r.getString(0) ->
        qs.indices.map(i => r.getDouble(i + 1)).toSeq).toMap
    val want = df.groupBy("k")
      .agg(expr("percentile(v, array(0.0, 0.25, 0.5, 0.9, 1.0))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, vs) =>
      vs.zip(want(k)).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"$k: $vs vs ${want(k)}")
      }
    }
  }

  test("rankByCdf matches ANSI windows on randomized multisets") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 50 + rnd.nextInt(200)
      val df = Seq.tabulate(n)(i => (i.toLong, rnd.nextInt(12) - 3))
        .toDF("doc_id", "v")
      val got = RankOps.rankByCdf(df, "v")
      val want = df
        .withColumn("pr", percent_rank().over(Window.orderBy("v")))
        .withColumn("cd", cume_dist().over(Window.orderBy("v")))
      val bad = got.join(want, "doc_id")
        .filter(abs(col("pct_rank") - col("pr")) > 1e-12 ||
          abs(col("cume_dist") - col("cd")) > 1e-12)
      assert(bad.count() === 0)
    }
  }

  test("the data frame is never globally sorted — only the histogram is") {
    // The plan must contain no Sort over the full row frame: ranking joins
    // a broadcast CDF back, so every Sort in the plan sits above the
    // distinct-value aggregate (whose input is the groupBy, not raw rows).
    val plan = RankOps.rankByCdf(rows, "v").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("fixture profiles are well-formed") {
    val pct = RankOps.pctRankProfile(spark, SparkSpec.FixtureDir).collect()
    assert(pct.length <= 10 && pct.nonEmpty)
    val med = RankOps.medianProfile(spark, SparkSpec.FixtureDir).collect()
    assert(med.nonEmpty)
  }
}
