package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotOps

/** The snapshot audit must classify every id exactly once, from the
  * content fingerprint (not the raw bytes' identity), and survive the
  * degenerate versions (identical snapshots, disjoint snapshots).
  */
class SnapshotOpsSpec extends SparkSuite {
  import spark.implicits._

  private def snap(rows: (Long, Long)*) =
    rows.toDF("doc_id", "fp")

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val old = snap(1L -> 10L, 2L -> 20L, 3L -> 30L)
    val neu = snap(2L -> 20L, 3L -> 31L, 4L -> 40L)
    val got = SnapshotOps.snapshotDiff(old, neu, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("identical snapshots are all unchanged; disjoint split added/removed") {
    val a = snap(1L -> 1L, 2L -> 2L)
    val same = SnapshotOps.snapshotDiff(a, a, "doc_id")
      .select("status").distinct().as[String].collect()
    assert(same.toSeq === Seq("unchanged"))
    val b = snap(3L -> 3L, 4L -> 4L)
    val dis = SnapshotOps.snapshotDiff(a, b, "doc_id")
      .groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dis === Map("removed" -> 2L, "added" -> 2L))
  }

  test("snapshotDiffQuery covers every doc id exactly once, all four statuses") {
    val dir = SparkSpec.FixtureDir
    val q = SnapshotOps.snapshotDiffQuery(spark, dir)
    val byStatus = q.groupBy("status").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every status is pinned non-empty by the synthetic version derivation
    assert(byStatus.keySet === Set("added", "removed", "changed", "unchanged"))
    assert(byStatus.values.forall(_ > 0))
    // classification is a partition of the union of both versions' ids
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(floor(max(col("doc_id")) * 0.9).cast("long"))
      .collect()(0).getLong(0)
    val unionIds = docs.filter(col("doc_id") <= cut || col("doc_id") % 101 =!= 0)
    assert(byStatus.values.sum === unionIds.count())
  }
}
