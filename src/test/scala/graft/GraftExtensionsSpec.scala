package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashExpressions => K}

/** The SQL function surface must build the exact same expressions as the
  * Column API — checked value-for-value over the fixture shapes.
  */
class GraftExtensionsSpec extends SparkSuite {

  // a derived session keeps the registrations out of the shared registry
  private lazy val sql = {
    val s = spark.newSession()
    GraftExtensions.register(s)
    s
  }

  test("rolling_hash SQL == Column API") {
    import sql.implicits._
    val df = Seq("spark join plan", "인공지능 학습", "").toDF("t")
    df.createOrReplaceTempView("t1")
    val viaSql = sql.sql("SELECT rolling_hash(t) FROM t1").collect().map(_.getLong(0))
    val viaCol = df.select(K.rollingHash(col("t"))).collect().map(_.getLong(0))
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("minhash over shingles SQL == Column API") {
    import sql.implicits._
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
    df.createOrReplaceTempView("t2")
    val viaSql = sql.sql(
      "SELECT minhash_sig(shingle_hash_set(t, 5), 32) FROM t2")
      .collect()(0).getSeq[Long](0)
    val viaCol = df.select(K.minhashSig(K.shingleHashSet(col("t"), 5), 32))
      .collect()(0).getSeq[Long](0)
    assert(viaSql === viaCol)
  }

  test("simhash_bits SQL == Column API at 60 bits") {
    import sql.implicits._
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
    df.createOrReplaceTempView("tsim")
    val viaSql = sql.sql(
      "SELECT simhash_bits(rolling_hash_array(graft_tokens(t, 2, 15)), 60) FROM tsim")
      .collect()(0).getLong(0)
    val viaCol = df.select(K.simhashK(K.rollingHashArray(
      graft.functions.TextFunctions.tokens(col("t"))), 60))
      .collect()(0).getLong(0)
    assert(viaSql === viaCol)
  }

  test("vector kernels: unit_vector + dot_product in SQL") {
    import sql.implicits._
    Seq((Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("t3")
    val cos = sql.sql(
      "SELECT dot_product(unit_vector(a), unit_vector(b)) FROM t3")
      .collect()(0).getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("text kernels in SQL: graft_tokens / quality_score / bpeish_count") {
    import sql.implicits._
    Seq("The quick brown fox and the lazy dog ran off 123")
      .toDF("t").createOrReplaceTempView("t5")
    val r = sql.sql(
      """SELECT graft_tokens(t, 2, 15) AS toks, quality_score(t) AS q,
        |       bpeish_count(t) AS bpe FROM t5""".stripMargin).collect()(0)
    assert(r.getSeq[String](0).take(3) == Seq("the", "quick", "brown"))
    assert(r.getDouble(1) == 1.0) // 11 tokens, markers, clean ASCII
    assert(r.getLong(2) > 0L)
  }

  test("non-literal size argument is rejected") {
    import sql.implicits._
    Seq("x").toDF("t").createOrReplaceTempView("t4")
    val e = intercept[Exception] {
      sql.sql("SELECT shingle_hash_set(t, length(t)) FROM t4").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("registrations are session-scoped, not global") {
    intercept[Exception] {
      spark.sql("SELECT rolling_hash('x')").collect()
    }
  }
}
