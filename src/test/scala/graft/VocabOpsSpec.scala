package graft

import org.apache.spark.sql.functions._

import graft.operators.VocabOps

/** Vocabulary induction: pair counts must equal a hand-derived answer on
  * known text (adjacency, not co-occurrence), and coverage must honor the
  * deterministic frequency-then-lexicographic vocabulary cut, with
  * oov_rate = 0 exactly when the vocabulary holds every distinct token.
  */
class VocabOpsSpec extends SparkSuite {
  import spark.implicits._

  test("mergePairCounts counts adjacent pairs, not co-occurrence") {
    val docs = Seq("aa bb aa bb cc", "bb cc", "xx").toDF("text")
    val got = VocabOps.mergePairCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // doc 1: pairs (aa bb)(bb aa)(aa bb)(bb cc); doc 2: (bb cc); doc 3: none
    assert(got === Map("aa bb" -> 2L, "bb aa" -> 1L, "bb cc" -> 2L))
  }

  test("vocabCoverage: full vocab means zero OOV; cut is deterministic on ties") {
    val docs = Seq(
      ("g1", "aa aa bb cc"),
      ("g2", "bb cc dd dd")
    ).toDF("grp", "text")
    val full = VocabOps.vocabCoverage(docs, "text", "grp", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(full.toSet === Set(("g1", 4L, 4L, 0.0), ("g2", 4L, 4L, 0.0)))
    // freqs: aa=2, bb=2, cc=2, dd=2 — all tied; vocabSize=2 takes the
    // lexicographically smallest two (aa, bb)
    val cut = VocabOps.vocabCoverage(docs, "text", "grp", 2)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(cut === Map("g1" -> (3L, 0.25), "g2" -> (1L, 0.75)))
  }

  test("bpeTrain learns the hand-worked merge sequence and stops when dry") {
    // "abab"×2, "ab"×3: round 1 (a,b) pf 2·2+3 = 7 — the abab candidates
    // at positions 0 and 2 do NOT overlap and both merge; round 2
    // (ab,</w>) pf 5; round 3 (ab,ab</w>) pf 2; then no pairs remain
    val words = Seq(("abab", 2L), ("ab", 3L)).toDF("w", "f")
    val got = VocabOps.bpeTrain(words, 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1, "a", "b", "ab", 7L),
      (2, "ab", "</w>", "ab</w>", 5L),
      (3, "ab", "ab</w>", "abab</w>", 2L)))
  }

  test("bpeTrain: overlapping candidates merge leftmost-first; ties by unit") {
    // "aaa": (a,a) candidates at 0 and 1 overlap — only position 0 merges.
    // Round 2 is a pf tie between (aa,a) and (a,</w>); 'a' < 'aa' wins.
    val words = Seq(("aaa", 1L)).toDF("w", "f")
    val got = VocabOps.bpeTrain(words, 10)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("a", "a", 2L), ("a", "</w>", 1L), ("aa", "a</w>", 1L)))
  }

  test("bpeEncode applies the table in order; dict encode = training units") {
    val words = Seq(("abab", 2L), ("ab", 3L)).toDF("w", "f")
    val merges = VocabOps.bpeTrain(words, 10)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // encode of the training dictionary reproduces the training loop's
    // final units exactly
    val enc = VocabOps.bpeEncode(words, merges)
      .select("w", "pos", "unit").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(enc === Set(("abab", 0, "abab</w>"), ("ab", 0, "ab</w>")))
    // a word the merges only partially cover: "ba" has no (a,b) adjacency
    val other = VocabOps.bpeEncode(Seq(("ba", 1L)).toDF("w", "f"), merges)
      .orderBy("pos").collect().map(_.getString(3))
    assert(other.toSeq === Seq("b", "a", "</w>"))
  }

  test("driver-local trainer == relational trainer on the fixture dictionary") {
    // the hybrid trainer's contract: same merge table, any k — pinned at
    // the query operating point (k=8, top-200 dictionary)
    val dict = Tables.documents(spark, SparkSpec.FixtureDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(200)
    val local = VocabOps.bpeTrainLocal(
      dict.collect().map(r => (r.getString(0), r.getLong(1))).toSeq, 8)
    val relational = VocabOps.bpeTrainSeq(dict, 8)
    assert(local === relational)
  }

  test("bpeEncodeFast == relational bpeEncode under the trained table") {
    val words = Seq(("abab", 2L), ("ab", 3L), ("ba", 1L), ("aaa", 4L))
      .toDF("w", "f")
    val merges = VocabOps.bpeTrain(words, 10)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("w", "f", "pos", "unit").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3)))
        .toSet
    assert(rows(VocabOps.bpeEncodeFast(words, merges)) ===
      rows(VocabOps.bpeEncode(words, merges)))
  }

  test("driver-local trainer reaches real merge counts in driver time") {
    val dict = Tables.documents(spark, SparkSpec.FixtureDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(200)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val t0 = System.nanoTime()
    val merges = VocabOps.bpeTrainLocal(dict, 1000)
    val ms = (System.nanoTime() - t0) / 1e6
    // dictionary-bounded: training stops when the units run dry, well
    // before 1000 on a 200-word dictionary — and in driver time, not in
    // 2000 scheduled Spark jobs (the relational trainer's asymptote)
    assert(merges.nonEmpty && merges.size <= 1000)
    assert(merges.map(_._1) === (1 to merges.size))
    assert(ms < 30000.0, s"local BPE training took ${ms}ms")
    info(f"k=1000 local training: ${merges.size} merges in $ms%.0f ms")
  }

  test("fixture queries: bounded output, rates in range, covered <= total") {
    val dir = SparkSpec.FixtureDir
    val pairs = VocabOps.mergePairsQuery(spark, dir).collect()
    assert(pairs.length <= 50 && pairs.nonEmpty)
    // descending by n, ties broken by pair asc — the order is total
    val ns = pairs.map(_.getLong(1))
    assert(ns.sameElements(ns.sortBy(-_)))
    val cov = VocabOps.coverageQuery(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(cov.nonEmpty)
    assert(cov.forall { case (tot, covd, oov) =>
      covd <= tot && oov >= 0.0 && oov <= 1.0 })
  }
}
