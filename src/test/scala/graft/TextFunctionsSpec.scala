package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Unit tests for the text primitives (SURVEY.md §2.8 F1-F5, P7-P8),
  * including the Korean-text edge cases the reference exercises.
  */
class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): Any =
    Seq(input).toDF("t").select(c.as("r")).collect()(0).get(0)

  test("cleanText strips punctuation, collapses whitespace, trims") {
    assert(one(cleanText(col("t")), "  Hello,   world! AI&ML  ") == "Hello world AIML")
  }

  test("cleanText keeps Korean and alphanumerics") {
    assert(one(cleanText(col("t")), "인공지능(AI) 모델 2024!") == "인공지능AI 모델 2024")
  }

  test("cleanText maps null to empty string") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(cleanText(col("t")).as("r")).collect()(0).getString(0)
    assert(r == "")
  }

  test("normalizeAi rewrites standalone ai and embedded AI (reference 3-step order)") {
    assert(one(normalizeAi(col("t")), "ai is AI, OpenAI mail") ==
      "인공지능 is 인공지능, Open인공지능 m인공지능l")
  }

  test("tokens keeps whitespace tokens within the length band") {
    val r = one(tokens(col("t"), 2, 5), "a bb ccc dddddd 또한")
      .asInstanceOf[scala.collection.Seq[String]].toList
    assert(r == Seq("bb", "ccc", "또한"))
  }

  test("koreanTokens extracts runs of Hangul of min length") {
    val r = one(koreanTokens(col("t")), "AI인공지능 모델x학습 y가")
      .asInstanceOf[scala.collection.Seq[String]].toList
    assert(r == Seq("인공지능", "모델", "학습"))
  }

  test("removeStopwords drops exact matches only") {
    val r = one(removeStopwords(tokens(col("t")), Seq("the", "and")),
      "the cat and the hat theory")
      .asInstanceOf[scala.collection.Seq[String]].toList
    assert(r == Seq("cat", "hat", "theory"))
  }

  test("removeStopwordsSubstring drops containment matches (BERTopic variant)") {
    val r = one(removeStopwordsSubstring(tokens(col("t")), Seq("the")),
      "the cat and the hat theory")
      .asInstanceOf[scala.collection.Seq[String]].toList
    assert(r == Seq("cat", "and", "hat"))
  }

  test("charShingles yields distinct n-grams; short strings yield none") {
    val r = one(charShingles(col("t"), 3), "abcabc").asInstanceOf[scala.collection.Seq[String]].toList
    assert(r == Seq("abc", "bca", "cab"))
    val short = one(charShingles(col("t"), 3), "ab").asInstanceOf[scala.collection.Seq[String]].toList
    assert(short.isEmpty)
  }

  test("tokenNgrams builds word n-grams") {
    val r = one(tokenNgrams(tokens(col("t")), 2), "big data spark engine")
      .asInstanceOf[scala.collection.Seq[String]].toList
    assert(r == Seq("big data", "data spark", "spark engine"))
  }
}
