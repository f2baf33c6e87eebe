package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.{AnalysisMain, FullAnalysisMain}

/** EP3 CLI contract (LDA_Analysis.py:731-876): flag parsing with the
  * reference's short forms, the 2..50 topic-count loop, and the report +
  * figure artifacts; plus the EP2 orchestrator (BERTopic_LDA_usage.py:20-69)
  * driving both runners with one shared topic count.
  */
class AnalysisMainSpec extends SparkSuite {

  test("parseArgs handles long and short flags") {
    val opts = AnalysisMain.parseArgs(
      Array("--data", "/tmp/d", "-t", "7", "-c", "cleaned_text"))
    assert(opts === Map("data" -> "/tmp/d", "topics" -> "7", "column" -> "cleaned_text"))
  }

  test("parseArgs rejects a dangling flag") {
    intercept[IllegalArgumentException] {
      AnalysisMain.parseArgs(Array("--topics"))
    }
  }

  test("valid explicit topic count wins without prompting") {
    assert(AnalysisMain.resolveTopics(Some(5), None) === 5)
    assert(AnalysisMain.resolveTopics(Some(2), None) === 2)
    assert(AnalysisMain.resolveTopics(Some(50), None) === 50)
  }

  test("out-of-bounds topic count re-prompts until valid (reference input loop)") {
    val answers = Iterator("abc", "99", "1", "7")
    val k = AnalysisMain.resolveTopics(Some(51), Some(() => answers.next()))
    assert(k === 7)
  }

  test("missing topic count prompts when interactive") {
    val k = AnalysisMain.resolveTopics(None, Some(() => "3"))
    assert(k === 3)
  }

  test("non-interactive out-of-bounds fails fast with the bounds message") {
    val e = intercept[IllegalArgumentException] {
      AnalysisMain.resolveTopics(Some(0), None)
    }
    assert(e.getMessage.contains("[2, 50]"))
    intercept[IllegalArgumentException] {
      AnalysisMain.resolveTopics(None, None)
    }
  }

  private def assertSvg(path: java.nio.file.Path): Unit = {
    assert(Files.exists(path), s"figure missing: $path")
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(path.toFile)
    assert(doc.getDocumentElement.getTagName == "svg")
  }

  test("EP3 CLI writes the report plus all four figures (curve from a real grid)") {
    val out = Files.createTempDirectory("graft-ep3").toString
    AnalysisMain.run(spark, SparkSpec.FixtureDir, "text", out,
      k = 3, maxIter = 5)
    assert(Files.exists(Paths.get(out, "_report.json")))
    Seq("word_frequency.svg", "lda_coherence_curve.svg",
      "topic_overlap.svg", "dominant_topics.svg")
      .foreach(f => assertSvg(Paths.get(out, f)))
    // the static-HTML wrapper embeds every figure inline
    val html = Files.readString(Paths.get(out, "index.html"))
    assert(html.contains("<!DOCTYPE html>"))
    assert(html.sliding(4).count(_ == "<svg") == 4)
  }

  test("EP2 orchestrator runs both halves with one shared topic count") {
    val out = Files.createTempDirectory("graft-ep2").toString
    val (clusterOk, ldaOk) = FullAnalysisMain.run(
      spark, SparkSpec.FixtureDir, "text", out, topics = 4, maxIter = 5)
    assert(clusterOk && ldaOk)
    assert(Files.exists(Paths.get(out, "bertopic", "_report.json")))
    assert(Files.exists(Paths.get(out, "lda", "_report.json")))
    assertSvg(Paths.get(out, "bertopic", "topic_similarity.svg"))
    assert(Files.exists(Paths.get(out, "bertopic", "index.html")))
    assert(Files.exists(Paths.get(out, "lda", "index.html")))
    // ±1 normalization: BOTH halves see the same k — 4 real clusters (noise
    // relabels within them) and 4 LDA topics
    val kw = graft.pipeline.ReportSink.readSheet(spark, s"$out/bertopic", "keywords")
      .select("cls").distinct().collect().map(_.get(0).toString).toSet
    assert(!kw.contains("-1") && kw.size <= 4)
    val topics = graft.pipeline.ReportSink.readSheet(spark, s"$out/lda", "topics")
      .select("topic").distinct().count()
    assert(topics == 4)
  }

  test("EP2 cluster half degrades gracefully without embeddings, LDA still runs") {
    val out = Files.createTempDirectory("graft-ep2-deg").toString
    val (clusterOk, ldaOk) = FullAnalysisMain.run(spark,
      s"${SparkSpec.FixtureDir}/documents.parquet", "text", out,
      topics = 3, maxIter = 5)
    assert(!clusterOk && ldaOk)
  }
}
