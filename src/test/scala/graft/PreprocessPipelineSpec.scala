package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.pipeline.{PreprocessPipeline => P, ReportSink}

/** EP1 parity on literal Korean fixtures: schema normalization, coerce-null
  * dates, keep-first dedup, derived columns, report sink, CSV roundtrip.
  */
class PreprocessPipelineSpec extends SparkSuite {
  import spark.implicits._

  private lazy val crawlRaw = Seq(
    ("2023-06-01 09:00:00", "AI 광고 확대", "인공지능 광고 시장이 커진다"),
    ("2023-06-02 10:00:00", "중복 기사", "완전히 동일한 본문"),
    ("2023-06-03 11:00:00", "중복 기사 2", "완전히 동일한 본문"), // dup contents → dropped (keep first)
    ("날짜아님", "날짜 오류", "날짜가 깨진 문서"),                 // bad date → null → dropped
    ("2023-07-15 12:00:00", null, "제목이 없는 문서")              // null title survives
  ).toDF("시작 날짜", "제목", "정제데이터")

  test("crawl-schema pipeline: canonical schema, dedup keep-first, coerce-null dates") {
    val out = P.prepareCrawl(crawlRaw)
    assert(out.columns.toSeq == Seq("date", "title", "contents",
      "title_contents", "year", "month", "cleaned_text"))
    val rows = out.orderBy("date").collect()
    assert(rows.length == 3) // 5 - 1 dup - 1 bad date
    // keep-first kept the 06-02 copy, not 06-03
    assert(rows.map(_.getAs[java.sql.Timestamp]("date").toString)
      .forall(!_.startsWith("2023-06-03")))
    val first = rows(0)
    assert(first.getAs[Int]("year") == 2023 && first.getAs[Int]("month") == 6)
    // null title → title_contents is just contents
    assert(rows(2).getAs[String]("title_contents") == "제목이 없는 문서")
  }

  test("AI normalization flows into cleaned_text (F2 then F1)") {
    val out = P.prepareBigkinds(Seq(
      ("2024-01-01", "ai 뉴스", "AI 기술! (특수문자 제거)"))
      .toDF("일자", "제목", "본문")).collect()(0)
    assert(out.getAs[String]("cleaned_text") == "인공지능 뉴스 인공지능 기술 특수문자 제거")
  }

  test("missing columns fail with the reference's column-listing diagnostic") {
    val bad = Seq(("x", "y")).toDF("제목", "본문")
    val e = intercept[IllegalArgumentException] {
      P.normalizeBigkinds(P.withIngestOrder(bad))
    }
    assert(e.getMessage.contains("일자"))
    assert(e.getMessage.contains("available columns"))
  }

  test("stopword loader trims, dedups, sorts; report sink writes named sheets") {
    val tmp = Files.createTempDirectory("graft-test").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/stop.txt"),
      "그리고\n\n또한 \n그리고\nthe\n")
    val sw = P.loadStopwords(spark, s"$tmp/stop.txt")
    assert(sw == Seq("the", "그리고", "또한"))

    val prep = P.prepareCrawl(crawlRaw)
    ReportSink.write(s"$tmp/report", Seq(
      "분석요약" -> prep.agg(count(lit(1)).as("n_docs")),
      "전처리본문" -> prep.select("date", "cleaned_text")))
    assert(Files.exists(java.nio.file.Paths.get(s"$tmp/report/_report.json")))
    val back = ReportSink.readSheet(spark, s"$tmp/report", "분석요약").collect()
    assert(back(0).getLong(0) == 3)
  }

  test("CSV sink/source roundtrip preserves Korean text and schema") {
    val tmp = Files.createTempDirectory("graft-csv").toString
    val df = Seq(("인공지능, 광고", "줄바꿈\n포함"), ("평범한", "행")).toDF("a", "b")
    P.writeCsv(df, s"$tmp/out")
    val back = P.readCsv(spark, s"$tmp/out")
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }
}
