package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, Tokenizer}

/** F4 seam: the analyzer chain resolves like the reference's fallback
  * (kiwi → soynlp → konlpy → simple, preprocessing.py:40-69) and a plugged
  * analyzer takes over without touching call sites.
  */
class TokenizerSpec extends SparkSuite {
  import spark.implicits._

  test("default tokenizer is the simple fallback when no analyzer registers") {
    assert(Tokenizer.default.name === "simple")
    val toks = Seq("인공지능 AI 학습 x 데이터").toDF("t")
      .select(Tokenizer.default.tokenize(col("t")))
      .collect()(0).getSeq[String](0)
    assert(toks === Seq("인공지능", "ai", "학습", "데이터")) // len-1 "x" dropped
  }

  test("korean-runs analyzer keeps only Korean runs") {
    val toks = Seq("인공지능 AI 학습 데이터x").toDF("t")
      .select(Tokenizer.KoreanRuns.tokenize(col("t")))
      .collect()(0).getSeq[String](0)
    assert(toks === Seq("인공지능", "학습", "데이터"))
  }

  test("a registered morphological analyzer wins the chain; vectorize consumes it") {
    object FakeKiwi extends Tokenizer {
      val name = "kiwi"
      // a deliberately different segmentation so the takeover is observable
      def tokenize(text: Column): Column =
        filter(TextFunctions.tokens(text), t => t =!= "ai")
    }
    Tokenizer.register(FakeKiwi)
    try {
      assert(Tokenizer.default.name === "kiwi")
      val toks = Seq("ai 인공지능 학습 데이터").toDF("t")
        .select(Tokenizer.default.tokenize(col("t")))
        .collect()(0).getSeq[String](0)
      assert(!toks.contains("ai"))
    } finally {
      Tokenizer.unregister("kiwi")
      assert(Tokenizer.default.name === "simple")
    }
  }
}
