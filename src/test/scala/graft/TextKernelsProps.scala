package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysisOps

/** Bit-equivalence of the TextKernels codegen expressions against the HOF
  * formulations they replaced (kept below as reference implementations):
  * tokens, quality score, BPE-ish count must agree on every input —
  * including the Unicode traps: non-ASCII letters as separators, Turkish
  * dotted I, sharp s, full-width forms, supplementary-plane emoji, NBSP
  * (not Java-\s), >100-char runs, empties and nulls.
  */
object TextAnalysisRef {
  import graft.functions.TextFunctions.normalized

  /** The pre-kernel tokens(): split(normalized) + interpreted filter. */
  def tokensHof(c: Column, minLen: Int, maxLen: Int): Column =
    filter(split(normalized(c), " "),
      t => length(t) >= minLen && length(t) <= maxLen)

  /** The pre-kernel quality score (four HOF/regex indicator components). */
  def qualityHof(text: Column): Column = {
    val norm = normalized(text)
    val toks = tokensHof(text, 1, 100)
    val nToks = size(toks).cast("double")
    val charsNoSpace = length(regexp_replace(norm, " ", "")).cast("double")
    val avgTokLen = when(nToks > 0, charsNoSpace / nToks).otherwise(lit(0.0))
    val stopHits = size(filter(toks,
      t => t.isin(TextAnalysisOps.allMarkers: _*))).cast("double")
    val stopRatio = when(nToks > 0, stopHits / nToks).otherwise(lit(0.0))
    val alnumChars = length(regexp_replace(coalesce(text, lit("")),
      "[^a-zA-Z0-9가-힣]", "")).cast("double")
    val totalChars = length(coalesce(text, lit(""))).cast("double")
    val alnumRatio = when(totalChars > 0, alnumChars / totalChars).otherwise(lit(0.0))
    when(nToks >= 5 && nToks <= 1000, 0.25).otherwise(0.0) +
      when(avgTokLen >= 2.0 && avgTokLen <= 12.0, 0.25).otherwise(0.0) +
      when(stopRatio >= 0.01, 0.25).otherwise(0.0) +
      when(alnumRatio >= 0.6, 0.25).otherwise(0.0)
  }

  /** The pre-kernel BPE-ish count (regexp_extract_all + HOF fold). */
  def bpeishHof(text: Column): Column =
    aggregate(
      transform(
        regexp_extract_all(lower(coalesce(text, lit(""))),
          lit(TextAnalysisOps.BpeishPattern), lit(0)),
        r => ceil(length(r) / 8.0)),
      lit(0L), (acc, x) => acc + x)
}

class TextKernelsProps extends SparkSuite {
  import spark.implicits._

  private val curated = Seq(
    null, "", " ", "\t\n\f\r", " ", // NBSP is NOT Java \s
    "the and of to in is that it was", // all markers
    "Hello World ABC123 mixed CASE",
    "한국어 텍스트 와 english MIXED 123",
    "café naïve Łódź İstanbul STRASSE ß ΣΙΓΜΑ",
    "ＡＢＣ full-width ２３４",
    "emoji 🎉🚀 and 中文字符 here",
    "x" * 120, // a run past the 100-char token cap
    ("ab " * 600).trim, // past the 1000-token band
    "a b c d e f g h", // short tokens, minLen boundary
    "word., punct!! marks?? y-e-s",
    "tab\tsep\nnewline\rret\fffvt",
    "12345678 123456789 abcdefgh abcdefghi", // ceil(len/8) boundaries
    "der die und das den von zu mit ist des extra")
  private def randomStrings(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val alphabet =
      "abz09 가힣 ABZ éüßİı中文🎉.,!?-\t\n " + ("e" * 8)
    Seq.fill(n)((0 until rnd.nextInt(60))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
  }

  private lazy val df = (curated ++ randomStrings(500, seed = 42L))
    .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")

  test("tokens kernel == HOF split+filter on curated and random Unicode") {
    for ((lo, hi) <- Seq((2, 15), (1, 100), (3, 5))) {
      val bad = df.select(col("id"),
        graft.functions.TextFunctions.tokens(col("text"), lo, hi).as("k"),
        TextAnalysisRef.tokensHof(col("text"), lo, hi).as("h"))
        .filter(not(col("k") === col("h"))) // null-safe: both never null
        .collect()
      assert(bad.isEmpty, s"bounds ($lo,$hi): ${bad.take(3).mkString("; ")}")
    }
  }

  test("letterTokenCount kernel == rlike-filter HOF on normalized tokens") {
    // the Gopher alpha rule's pre-kernel form: an interpreted ArrayFilter
    // running `t rlike '[a-z가-힣]'` per token. Over arrays produced by the
    // `tokens` kernel (alphabet [a-z0-9가-힣]) "contains a letter" and
    // "contains a non-digit byte" are the same predicate — pinned here on
    // the full curated + random Unicode corpus at the funnel's (1, 100)
    // band and the default (2, 15) band.
    for ((lo, hi) <- Seq((1, 100), (2, 15))) {
      val bad = df.select(col("id"),
        graft.functions.TextExpressions.letterTokenCountK(
          graft.functions.TextFunctions.tokens(col("text"), lo, hi)).as("k"),
        size(filter(graft.functions.TextFunctions.tokens(col("text"), lo, hi),
          t => t.rlike("[a-z가-힣]"))).cast("long").as("h"))
        .filter(not(col("k") === col("h")))
        .collect()
      assert(bad.isEmpty, s"bounds ($lo,$hi): ${bad.take(3).mkString("; ")}")
    }
  }

  test("quality kernel == four-indicator HOF formulation") {
    val bad = df.select(col("id"),
      TextAnalysisOps.qualityScoreCol(col("text")).as("k"),
      TextAnalysisRef.qualityHof(col("text")).as("h"))
      .filter(not(col("k") === col("h")))
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("; "))
  }

  test("bpeish kernel == regex-segment HOF fold") {
    val bad = df.select(col("id"), col("text"),
      TextAnalysisOps.bpeishTokenCount(col("text")).as("k"),
      TextAnalysisRef.bpeishHof(col("text")).as("h"))
      .filter(not(col("k") === col("h")))
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("; "))
  }
}
