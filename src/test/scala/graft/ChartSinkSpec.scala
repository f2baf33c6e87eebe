package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.ChartSink

/** S7 figure sinks: deterministic SVG renderings of the reference's
  * word-frequency bar chart (preprocessing.py:400-456) and coherence curve
  * (LDA_Analysis.py:614-677).
  */
class ChartSinkSpec extends SparkSuite {
  import spark.implicits._

  test("bar chart renders one bar per row, deterministically") {
    val rows = Seq("spark" -> 42.0, "join" -> 17.0, "agg" -> 5.0)
    val svg = ChartSink.barChartSvg(rows, "Top words")
    assert(svg.startsWith("<svg"))
    assert("<rect ".r.findAllIn(svg).size === 3)
    assert(svg.contains("spark") && svg.contains("42.00"))
    assert(svg === ChartSink.barChartSvg(rows, "Top words"))
  }

  test("line chart sorts by x and marks every point") {
    val svg = ChartSink.lineChartSvg(
      Seq(8.0 -> -2.5, 2.0 -> -1.0, 5.0 -> -0.5), "Coherence", "k", "umass")
    assert("<circle ".r.findAllIn(svg).size === 3)
    assert(svg.contains("<polyline"))
  }

  test("escapes XML-unsafe labels") {
    val svg = ChartSink.barChartSvg(Seq("a<b&c" -> 1.0), "t<&>")
    assert(!svg.contains("a<b"))
    assert(svg.contains("a&lt;b&amp;c"))
  }

  test("writeWordFrequencyChart collects a (word, freq) frame to an svg file") {
    val out = Files.createTempDirectory("chart").resolve("wf.svg").toString
    val top = Seq(("spark", 10L), ("data", 7L)).toDF("word", "freq")
    ChartSink.writeWordFrequencyChart(top, out)
    val svg = Files.readString(Paths.get(out))
    assert(svg.contains("spark") && svg.contains("10.00"))
  }

  test("heatmap mirrors the upper triangle and renders the diagonal as 1") {
    val svg = ChartSink.heatmapSvg(
      Seq(("0", "1", 0.4), ("0", "2", 0.1), ("1", "2", 0.9)), "sim")
    assert("<rect ".r.findAllIn(svg).size === 9) // 3x3 grid
    assert("1.00".r.findAllIn(svg).size >= 3) // three diagonal cells
    assert(svg.contains("0.90") && svg.contains("0.40"))
  }

  test("writeCoherenceCurve renders a (k, score) frame") {
    val out = Files.createTempDirectory("chart").resolve("coh.svg").toString
    val grid = Seq((2, -1.2), (3, -0.8), (5, -1.5)).toDF("k", "umass")
    ChartSink.writeCoherenceCurve(grid, out)
    assert(Files.readString(Paths.get(out)).contains("<polyline"))
  }
}
