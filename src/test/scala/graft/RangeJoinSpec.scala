package graft

import graft.operators.RelationalOps

/** Bucketized range-join semantics: exact containment with inclusive
  * boundaries, multi-bucket intervals pair once, and the physical plan is
  * an equi-join on the bucket key — never a nested loop.
  */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val points = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 31L))
    .toDF("pid", "p")
  private lazy val ivs = Seq((100L, 0L, 10L), (200L, 10L, 30L))
    .toDF("iid", "s", "e")

  test("pairs points with every containing interval; boundaries inclusive; no dup pairs") {
    val got = RelationalOps.rangeJoin(points, ivs, "p", "s", "e",
      bucketWidth = 7L)
      .select("pid", "iid").as[(Long, Long)].collect()
    // p=10 sits on both intervals' boundaries; p=31 is outside all;
    // interval 200 spans buckets 1..4 at width 7 but each pair lands once
    assert(got.toSet === Set((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L)))
    assert(got.length === got.toSet.size)
  }

  test("result is independent of the bucket width") {
    def run(w: Long) = RelationalOps.rangeJoin(points, ivs, "p", "s", "e", w)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(run(1L) === run(7L) && run(7L) === run(1000L))
  }

  test("plans as an equi-join on the bucket key, never a nested loop") {
    val plan = RelationalOps.rangeJoin(points, ivs, "p", "s", "e", 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
