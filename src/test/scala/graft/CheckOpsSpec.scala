package graft

import org.apache.spark.sql.functions._

import graft.operators.CheckOps
import graft.operators.CheckOps._

/** Constraint checker: each rule type counts exactly its violations on a
  * frame with planted defects, nulls violate every row-wise rule, and the
  * row-wise rules share one scan.
  */
class CheckOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("alpha"), Some("en"), Some(10)),
    (2L, None, Some("ko"), Some(50)), // null text
    (3L, Some("beta!"), Some("xx"), Some(500)), // bad lang, bad pattern, high
    (3L, Some("gamma"), None, None) // dup id, null lang, null value
  ).toDF("id", "text", "lang", "v")

  test("each rule type counts exactly its planted violations") {
    val got = CheckOps.check(df, Seq(
      Unique("id"),
      NotNull("text"),
      InSet("lang", Seq("en", "ko")),
      InRange("v", 0, 100),
      Matches("text", "^[a-z]+$")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(got(("unique", "id")) === ((4L, 1L, 0)))
    assert(got(("not_null", "text")) === ((4L, 1L, 0)))
    assert(got(("in_set", "lang")) === ((4L, 2L, 0))) // xx + null
    assert(got(("in_range", "v")) === ((4L, 2L, 0))) // 500 + null
    assert(got(("matches", "text")) === ((4L, 2L, 0))) // beta! + null
  }

  test("vector rules catch dim drift, NaNs, and null elements") {
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f)), // clean
      (2L, Seq(1.0f, 2.0f, 3.0f)), // wrong dim
      (3L, Seq(Float.NaN, 2.0f)), // NaN element
      (4L, null.asInstanceOf[Seq[Float]]) // null vector
    ).toDF("vec_id", "emb")
    val withNullElem = vecs.union(
      Seq((5L, Seq[java.lang.Float](1.0f, null))
      ).toDF("vec_id", "emb"))
    val got = CheckOps.check(withNullElem, Seq(
      VecDim("emb", 2), VecFinite("emb")))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("vec_dim") === 2L) // wrong dim + null vector
    assert(got("vec_finite") === 3L) // NaN + null vector + null element
  }

  test("a clean frame passes every rule") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val got = CheckOps.check(clean, Seq(Unique("id"), NotNull("text")))
    assert(got.filter(col("passed") =!= 1).count() === 0)
    assert(got.count() === 2)
  }

  test("row-wise rules fold into one aggregate over one scan") {
    val plan = CheckOps.check(df, Seq(
      NotNull("text"), InSet("lang", Seq("en")), InRange("v", 0, 100)))
      .queryExecution.executedPlan.toString
    // no Unique rule → no expand, and the source is scanned exactly once
    assert(!plan.contains("Expand"))
    assert("LocalTableScan".r.findAllIn(plan).size === 1)
  }

  test("empty rule list is refused") {
    intercept[IllegalArgumentException] { CheckOps.check(df, Nil) }
  }

  test("checkBy slices violations to the group that shipped them") {
    val sliced = Seq(
      ("a", Some("x"), 10), ("a", None, 20), // a: 1 null text
      ("b", Some("y"), 999), ("b", Some("z"), 5) // b: 1 out of range
    ).toDF("src", "text", "v")
    val got = CheckOps.checkBy(sliced, "src",
      Seq(NotNull("text"), InRange("v", 0, 100)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(got(("a", "not_null")) === 1L && got(("a", "in_range")) === 0L)
    assert(got(("b", "not_null")) === 0L && got(("b", "in_range")) === 1L)
    intercept[IllegalArgumentException] {
      CheckOps.checkBy(sliced, "src", Seq(Unique("src")))
    }
  }

  test("checkRef counts orphans and null keys; small dims broadcast") {
    val fact = Seq(Some(1L), Some(2L), Some(9L), None)
      .toDF("k") // 9 is an orphan, null violates
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val report = CheckOps.checkRef(fact, "k", dim, "dk")
    val r = report.collect().head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4))
      === (("ref_integrity", "k", 4L, 2L, 0)))
    // the fact side anti-joins a broadcast of the dim's distinct keys
    assert(report.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("merged shard reports equal one check over the concatenated data") {
    val s1 = df.filter(col("id") <= 2)
    val s2 = df.filter(col("id") > 2)
    val rules = Seq(NotNull("text"), InRange("v", 0, 100))
    val merged = CheckOps.mergeReports(
        Seq(CheckOps.check(s1, rules), CheckOps.check(s2, rules)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    val whole = CheckOps.check(df, rules)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(merged === whole)
  }

  test("mergeReports rejects reports carrying unique rows") {
    // distinct counts don't sum across shards: the same key can appear in
    // two shards, each locally unique — merging would return a wrong
    // number, so the merge must fail loudly instead
    val s1 = df.filter(col("id") <= 2)
    val s2 = df.filter(col("id") > 2)
    val withUnique = Seq(Unique("id"), NotNull("text"))
    val ex = intercept[IllegalArgumentException] {
      CheckOps.mergeReports(
        Seq(CheckOps.check(s1, withUnique), CheckOps.check(s2, withUnique)))
    }
    assert(ex.getMessage.contains("unique"))
  }

  test("hostile column names survive the report explode (no SQL splicing)") {
    // a column named with quotes/commas must flow through as a literal,
    // not break (or inject into) the generated plan. (Backticks stay
    // subject to Spark's own attribute-name grammar in col() — unpaired
    // ones are rejected by the engine itself, before any rule runs.)
    val weird = "it's, a 'weird' name"
    val data = Seq((1L, "x"), (2L, null.asInstanceOf[String]))
      .toDF("id", weird)
    val rows = CheckOps.check(data, Seq(NotNull(weird)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    assert(rows.toSeq == Seq(("not_null", weird, 2L, 1L, 0)))
  }
}
