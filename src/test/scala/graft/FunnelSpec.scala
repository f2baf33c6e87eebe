package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RelationalOps

/** Funnel semantics: stages must complete strictly in order, each stage
  * time is the earliest valid one, and counts are monotonically
  * nonincreasing down the funnel.
  */
class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 09:$minute%02d:00")

  private val events = Seq(
    // user 1 completes in order: view(1) -> click(5) -> purchase(9)
    (1L, ts(1), "view"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
    // user 2 clicks BEFORE viewing; the later click continues the funnel
    (2L, ts(3), "click"), (2L, ts(4), "view"), (2L, ts(8), "click"),
    // user 3 purchases before clicking: purchase must NOT count
    (3L, ts(1), "view"), (3L, ts(2), "purchase"), (3L, ts(6), "click"),
    // user 4 never views: no stage counts
    (4L, ts(1), "click"), (4L, ts(2), "purchase"))
    .toDF("user_id", "ts", "event_type")

  test("stages complete strictly in order; earliest valid times chosen") {
    val reached = RelationalOps.funnelStages(
      events, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
    val viewed = reached(0).collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val clicked = reached(1).collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val bought = reached(2).collect().map(_.getLong(0)).toSet
    assert(viewed.keySet === Set(1L, 2L, 3L))
    assert(clicked.keySet === Set(1L, 2L, 3L))
    assert(clicked(2L) === ts(8), "pre-view click ignored, post-view click counts")
    assert(bought === Set(1L), "out-of-order purchase (user 3) must not count")
  }

  test("fixture funnel: counts nonincreasing, stage-1 rate is 1.0") {
    val rows = RelationalOps.funnelQuery(spark, SparkSpec.FixtureDir).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(2)).sliding(2).forall(p => p(0) >= p(1)))
    assert(rows(0).getDouble(3) === 1.0)
  }
}
