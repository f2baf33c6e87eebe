package graft

import org.apache.spark.sql.functions._

import graft.operators.{IndexMaintOps, SimilarityOps}

/** Incremental index maintenance must equal a full rebuild at the same
  * frozen centroids — and must get there by carrying unchanged postings
  * and re-assigning only the delta.
  */
class IndexMaintOpsSpec extends SparkSuite {
  import spark.implicits._

  // two fixed unit centroids on the x / y axes
  private lazy val cents = Seq(
    (0, Array(1.0, 0.0)), (1, Array(0.0, 1.0))).toDF("list", "centroid")

  private def vecs(rows: (Long, Array[Double])*) = rows.toDF("vec_id", "nv")

  test("assignLists takes the max-dot list, ties to the smallest list id") {
    val v = vecs(
      1L -> Array(0.9, 0.1), // → list 0
      2L -> Array(0.1, 0.9), // → list 1
      3L -> Array(0.5, 0.5)) // tie → list 0
    val got = IndexMaintOps.assignLists(cents, v)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("maintainIndex carries unchanged, reassigns delta, drops removed") {
    val old = vecs(1L -> Array(0.9, 0.1), 2L -> Array(0.1, 0.9),
      3L -> Array(0.8, 0.2))
    val neu = vecs(1L -> Array(0.9, 0.1), // unchanged → kept
      3L -> Array(0.2, 0.8), // changed → reassigned to list 1
      4L -> Array(0.0, 1.0)) // added → reassigned; 2 removed
    val stored = IndexMaintOps.assignLists(cents, old)
    val got = IndexMaintOps.maintainIndex(stored, old, neu, cents)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(got === Map(
      1L -> ((0, "kept")), 3L -> ((1, "reassigned")), 4L -> ((1, "reassigned"))))
  }

  test("maintained index equals a full rebuild at the same centroids (fixture)") {
    val corpus = SimilarityOps.unitCorpus(Tables.embeddings(spark, SparkSpec.FixtureDir))
    val cut = corpus.agg(floor(max(col("vec_id")) * 0.9).cast("long"))
      .collect()(0).getLong(0)
    val old = corpus.filter(col("vec_id") <= cut)
      .withColumn("nv", when(col("vec_id") % 97 === 0,
        transform(col("nv"), x => -x)).otherwise(col("nv")))
    val neu = corpus.filter(col("vec_id") % 101 =!= 0)
    val (_, kmCents) = SimilarityOps.ivfIndex(old, nLists = 8)
    val stored = IndexMaintOps.assignLists(kmCents, old)
    val maintained = IndexMaintOps.maintainIndex(stored, old, neu, kmCents)
      .select("vec_id", "list")
    val rebuilt = IndexMaintOps.assignLists(kmCents, neu)
    assert(maintained.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(maintained).count() === 0)
    // and the delta really is the only re-assigned mass
    val nChanged = old.filter(col("vec_id") % 97 === 0)
      .join(neu, "vec_id").count()
    val nAdded = neu.join(old, Seq("vec_id"), "left_anti").count()
    val reassigned = IndexMaintOps.maintainIndex(stored, old, neu, kmCents)
      .filter(col("origin") === "reassigned").count()
    assert(reassigned === nChanged + nAdded)
  }

  test("drift gauge: two tiers over one ground truth, verdict wired to the " +
    "committed threshold") {
    val rows = IndexMaintOps.ivfDriftQuery(spark, SparkSpec.FixtureDir)
      .collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("frozen", "retrained"))
    val frozen = rows("frozen")
    val retrained = rows("retrained")
    // same query set against the same brute ground truth
    assert(frozen.getLong(1) === retrained.getLong(1))
    // the retrained world is the reference: its drop is exactly 0
    assert(retrained.getDouble(4) === 0.0)
    assert(retrained.getInt(5) === 0)
    // the frozen tier's verdict must be its drop vs the threshold
    assert((frozen.getInt(5) == 1) ===
      (frozen.getDouble(4) > IndexMaintOps.DriftRetrainThreshold))
    // recalls are valid ratios
    Seq(frozen, retrained).foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) <= r.getDouble(2))
    }
  }
}
