package graft

import org.apache.spark.sql.functions._

import graft.operators.RelationalOps

/** Ingest monitoring faces: trailing z-score anomaly flags and weekly
  * cohort retention.
  */
class MonitorOpsSpec extends SparkSuite {
  import spark.implicits._

  test("anomalyScore flags a spike over a varying baseline, not warmup") {
    // alternating 9/11 baseline (sd > 0), a 100-count spike on day 9
    val counts = Seq(9L, 11L, 9L, 11L, 9L, 11L, 9L, 11L, 100L, 10L)
    val daily = counts.zipWithIndex.map { case (n, i) =>
      (f"2024-01-${i + 1}%02d", n) }.toDF("d", "n")
      .select(to_date(col("d")).as("day"), col("n"))
    val got = RelationalOps.anomalyScore(daily).collect()
    val flags = got.map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(flags.count(_._2) === 1 && flags("2024-01-09"))
    // day 1 has an empty window, day 2 a single-row one: z null, unflagged
    val zs = got.map(r => r.getString(0) -> Option(r.get(4))).toMap
    assert(zs("2024-01-01").isEmpty && zs("2024-01-02").isEmpty)
    assert(zs("2024-01-09").exists(_.asInstanceOf[Double] > 2.0))
  }

  test("anomalyScore: constant windows give null z (no division by zero)") {
    val daily = (1 to 9).map(i => (f"2024-02-$i%02d", 10L)).toDF("d", "n")
      .select(to_date(col("d")).as("day"), col("n"))
    val got = RelationalOps.anomalyScore(daily).collect()
    assert(got.forall(r => r.get(4) == null && !r.getBoolean(5)))
  }

  test("cohortRetention: offset 0 covers every cohort and every user once") {
    val ret = RelationalOps.cohortRetention(spark, SparkSpec.FixtureDir)
    val rows = ret.collect()
    assert(rows.forall(_.getInt(1) >= 0))
    val cohorts = rows.map(_.getString(0)).distinct
    val atZero = rows.filter(_.getInt(1) == 0)
    // every cohort has its week-0 row, and week-0 user counts sum to the
    // total distinct user population (each user is in exactly one cohort
    // and is active in their first week by definition)
    assert(atZero.map(_.getString(0)).toSet === cohorts.toSet)
    val users = Tables.events(spark, SparkSpec.FixtureDir)
      .select("user_id").distinct().count()
    assert(atZero.map(_.getLong(2)).sum === users)
  }
}
