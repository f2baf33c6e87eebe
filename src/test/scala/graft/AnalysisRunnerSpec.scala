package graft

import java.nio.file.Files

import graft.pipeline.{AnalysisRunner, ReportSink}

/** End-to-end EP2/EP3 runs on the smallest fixture: one report directory
  * each, every expected sheet present and populated.
  */
class AnalysisRunnerSpec extends SparkSuite {
  private val dir = SparkSpec.FixtureDir

  test("runLdaAnalysis writes the full EP3 report") {
    val out = Files.createTempDirectory("graft-lda-report").toString
    AnalysisRunner.runLdaAnalysis(spark, Tables.documents(spark, dir), "text",
      out, k = 3, maxIter = 5)
    val sheets = Seq("topics", "topics_formatted", "dominant", "coherence",
      "diversity", "overlap", "interpretation", "summary")
    sheets.foreach { s =>
      val n = ReportSink.readSheet(spark, out, s).count()
      assert(n > 0, s"sheet $s is empty")
    }
    assert(ReportSink.readSheet(spark, out, "topics").count() == 30) // 3 x 10
    val coh = ReportSink.readSheet(spark, out, "coherence").collect()
    assert(coh.length == 3 && coh.forall(_.getDouble(1) <= 0.0))
  }

  test("runClusterAnalysis writes the full EP2 report") {
    val out = Files.createTempDirectory("graft-cluster-report").toString
    AnalysisRunner.runClusterAnalysis(spark, Tables.documents(spark, dir),
      Tables.embeddings(spark, dir).withColumnRenamed("vec_id", "vec_id"),
      "doc_id", "text", out, k = 4)
    val sheets = Seq("keywords", "keywords_dedup", "sizes", "diversity",
      "similarity", "examples", "interpretation", "summary")
    sheets.foreach { s =>
      assert(ReportSink.readSheet(spark, out, s).count() > 0, s"sheet $s empty")
    }
    val sizes = ReportSink.readSheet(spark, out, "sizes").collect()
    assert(sizes.map(_.getLong(1)).sum == 500)
  }

  test("format=xlsx writes the report as one workbook (S5 parity)") {
    val out = Files.createTempDirectory("graft-xlsx-report").toString
    AnalysisRunner.runLdaAnalysis(spark, Tables.documents(spark, dir), "text",
      out, k = 3, maxIter = 5, format = "xlsx")
    assert(Files.exists(java.nio.file.Paths.get(s"$out/report.xlsx")))
    // sheet1 = "topics" (first sheet in declaration order)
    val topics = graft.pipeline.ExcelIO.readXlsx(spark, s"$out/report.xlsx", "sheet1")
    assert(topics.count() == 30)
    assert(topics.columns.toSeq == Seq("topic", "rank", "term", "weight"))
  }
}
