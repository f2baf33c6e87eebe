package graft

import org.apache.spark.sql.functions._

import graft.operators.SpanDedupOps
import graft.functions.HashExpressions.{rollingHashArray, windowHashList, windowHashSet}

/** Behavioral tests for the duplicated-span (substring) dedup tier on a tiny
  * corpus with hand-checkable span structure. k = 4 throughout so partial,
  * adjacent, gapped, and full-coverage spans all fit in short docs.
  */
class SpanDedupSpec extends SparkSuite {
  import spark.implicits._

  private val K = 4

  // d1/d2 share the 4-token boilerplate "alpha beta gamma delta" at
  // different offsets; d3 repeats its own 4-gram (within-doc duplication,
  // gap 6 > k -> two spans); d4 is clean; d5/d6 are identical 5-token docs
  // (full coverage); d7/d8 share TWO 4-grams — adjacent in d7 (starts 0,4:
  // gap = k merges into ONE contiguous span) but gapped in d8 (starts 0,5:
  // gap > k keeps two spans).
  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta x1 x2 x3 x4 x5"),
    (2L, "y1 y2 alpha beta gamma delta y3 y4"),
    (3L, "p q r s junk1 junk2 p q r s"),
    (4L, "u1 u2 u3 u4 u5"),
    (5L, "full dup doc here totally"),
    (6L, "full dup doc here totally"),
    (7L, "a1 a2 a3 a4 b1 b2 b3 b4 tail1 tail2"),
    (8L, "a1 a2 a3 a4 mid b1 b2 b3 b4")
  ).toDF("doc_id", "text")

  private lazy val profile =
    SpanDedupOps.spanProfile(docs, "doc_id", "text", K).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap

  test("spanProfile: cross-doc boilerplate marks one span per doc") {
    // (n_tokens, dup_starts, n_spans, dup_tokens, dup_frac)
    assert(profile(1L) == ((9L, 1L, 1L, 4L, 0.4444)))
    assert(profile(2L) == ((8L, 1L, 1L, 4L, 0.5)))
  }

  test("spanProfile: within-doc repetition counts toward the threshold") {
    // starts 0 and 6: gap 6 > k -> two spans of 4 tokens each
    assert(profile(3L) == ((10L, 2L, 2L, 8L, 0.8)))
  }

  test("spanProfile: clean docs are absent; identical docs fully covered") {
    assert(!profile.contains(4L))
    // 5-token doc, grams at 0 and 1 both duplicated: covered 4+min(1,4)=5
    assert(profile(5L) == ((5L, 2L, 1L, 5L, 1.0)))
    assert(profile(6L) == profile(5L))
  }

  test("spanProfile: adjacent starts merge, gapped starts do not") {
    // d7 starts 0,4 (gap = k): ONE span covering 8 of 10 tokens
    assert(profile(7L) == ((10L, 2L, 1L, 8L, 0.8)))
    // d8 starts 0,5 (gap > k): TWO spans, 8 of 9 tokens
    assert(profile(8L) == ((9L, 2L, 2L, 8L, 0.8889)))
  }

  test("spanScrub rebuilds text outside the span union, keeps empty docs") {
    val scrub = SpanDedupOps.spanScrub(docs, "doc_id", "text", K).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(scrub(1L) == ((9L, 5L, "x1 x2 x3 x4 x5")))
    assert(scrub(3L) == ((10L, 2L, "junk1 junk2")))
    assert(scrub(7L) == ((10L, 2L, "tail1 tail2")))
    // fully-covered docs remain, with empty text — scrubbed, not dropped
    assert(scrub(5L) == ((5L, 0L, "")))
    assert(scrub(6L) == ((5L, 0L, "")))
    assert(!scrub.contains(4L))
    // profile and scrub agree on the span union size
    profile.foreach { case (id, (nTok, _, _, dupTok, _)) =>
      assert(scrub(id)._2 == nTok - dupTok, s"doc $id kept-token mismatch")
    }
  }

  test("windowHashList is the positional face of windowHashSet") {
    val arrs = Seq(
      Seq(1L, 2L, 3L, 4L, 5L, 1L, 2L, 3L, 4L, 5L), // repeating windows
      Seq(7L, 7L, 7L, 7L, 7L),                      // constant
      Seq(1L, 2L),                                  // shorter than n
      Seq.empty[Long]
    ).toDF("hs")
    val rows = arrs.select(
      windowHashList(col("hs"), 3).as("lst"),
      windowHashSet(col("hs"), 3).as("set"),
      size(col("hs")).as("n")).collect()
    rows.foreach { r =>
      val lst = r.getSeq[Long](0)
      val set = r.getSeq[Long](1)
      val n = r.getInt(2)
      assert(lst.length == math.max(0, n - 2), "one hash per window start")
      assert(lst.distinct == set, "set face = first-occurrence distinct of list face")
    }
  }

  test("span starts align with token positions (hash of the right window)") {
    // the gram at start i hashes tokens i..i+k-1: shifting a doc by a prefix
    // shifts every start by the prefix length and nothing else
    val shifted = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "pre1 pre2 pre3 alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val ghs = shifted.select(col("doc_id"),
      windowHashList(rollingHashArray(
        graft.functions.TextFunctions.tokens(col("text"), 1, 100)), K).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(ghs(1L).length == 1 && ghs(2L).length == 4)
    assert(ghs(2L)(3) == ghs(1L)(0), "same window content, shifted start")
  }
}
