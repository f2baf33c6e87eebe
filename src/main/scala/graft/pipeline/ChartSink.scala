package graft.pipeline

import java.nio.file.{Files, Paths}
import java.util.Locale

import org.apache.spark.sql.DataFrame

/** S7 — the reference's matplotlib figures as deterministic SVG sinks
  * (no plotting library in scope; SVG is plain text, so the charts stay
  * byte-reproducible and diffable):
  *
  *   - word-frequency bar chart (/root/reference/preprocessing.py:400-456)
  *   - coherence-vs-k curve (LDA_Analysis.py:614-677)
  *
  * Only the already-aggregated top-N/K rows are collected — the chart is a
  * report artifact, never a data-scale operation.
  */
object ChartSink {

  private val W = 720
  private val H = 480
  private val MarginLeft = 140
  private val MarginRight = 30
  private val MarginTop = 50
  private val MarginBottom = 40

  private def fmt(d: Double): String = "%.2f".formatLocal(Locale.ROOT, d)

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Horizontal bar chart (the reference's barh of top words). */
  def barChartSvg(rows: Seq[(String, Double)], title: String): String = {
    require(rows.nonEmpty, "bar chart needs at least one row")
    val maxV = math.max(rows.map(_._2).max, 1e-9)
    val plotW = W - MarginLeft - MarginRight
    val barH = (H - MarginTop - MarginBottom).toDouble / rows.size
    val bars = rows.zipWithIndex.map { case ((label, v), i) =>
      val y = MarginTop + i * barH
      val w = v / maxV * plotW
      s"""<text x="${MarginLeft - 8}" y="${fmt(y + barH * 0.65)}" text-anchor="end" font-size="12">${esc(label)}</text>
         |<rect x="$MarginLeft" y="${fmt(y + barH * 0.15)}" width="${fmt(w)}" height="${fmt(barH * 0.7)}" fill="#4878a8"/>
         |<text x="${fmt(MarginLeft + w + 4)}" y="${fmt(y + barH * 0.65)}" font-size="11">${fmt(v)}</text>""".stripMargin
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" font-family="sans-serif">
       |<text x="${W / 2}" y="28" text-anchor="middle" font-size="16">${esc(title)}</text>
       |$bars
       |</svg>""".stripMargin
  }

  /** Line chart of (x, y) points sorted by x (coherence/diversity curves). */
  def lineChartSvg(points: Seq[(Double, Double)], title: String,
                   xLabel: String, yLabel: String): String = {
    require(points.nonEmpty, "line chart needs at least one point")
    val pts = points.sortBy(_._1)
    val (xs, ys) = (pts.map(_._1), pts.map(_._2))
    val (xMin, xMax) = (xs.min, xs.max)
    val (yMin, yMax) = (ys.min, ys.max)
    val xSpan = math.max(xMax - xMin, 1e-9)
    val ySpan = math.max(yMax - yMin, 1e-9)
    val plotW = W - MarginLeft - MarginRight
    val plotH = H - MarginTop - MarginBottom
    def px(x: Double) = MarginLeft + (x - xMin) / xSpan * plotW
    def py(y: Double) = MarginTop + plotH - (y - yMin) / ySpan * plotH
    val path = pts.map { case (x, y) => s"${fmt(px(x))},${fmt(py(y))}" }
      .mkString(" ")
    val marks = pts.map { case (x, y) =>
      s"""<circle cx="${fmt(px(x))}" cy="${fmt(py(y))}" r="4" fill="#4878a8"/>
         |<text x="${fmt(px(x))}" y="${fmt(py(y) - 10)}" text-anchor="middle" font-size="11">${fmt(y)}</text>""".stripMargin
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" font-family="sans-serif">
       |<text x="${W / 2}" y="28" text-anchor="middle" font-size="16">${esc(title)}</text>
       |<polyline points="$path" fill="none" stroke="#4878a8" stroke-width="2"/>
       |$marks
       |<text x="${W / 2}" y="${H - 8}" text-anchor="middle" font-size="12">${esc(xLabel)}</text>
       |<text x="16" y="${H / 2}" font-size="12" transform="rotate(-90 16 ${H / 2})" text-anchor="middle">${esc(yLabel)}</text>
       |</svg>""".stripMargin
  }

  /** Vertical bar chart — the reference's word-frequency figure shape
    * (preprocessing.py:400-456 draws vertical bars with rotated x labels
    * and values above each bar).
    */
  def verticalBarChartSvg(rows: Seq[(String, Double)], title: String): String = {
    require(rows.nonEmpty, "bar chart needs at least one row")
    val maxV = math.max(rows.map(_._2).max, 1e-9)
    val plotH = H - MarginTop - MarginBottom - 30 // room for rotated labels
    val barW = (W - MarginLeft - MarginRight).toDouble / rows.size
    val bars = rows.zipWithIndex.map { case ((label, v), i) =>
      val x = MarginLeft + i * barW
      val h = v / maxV * plotH
      val y = MarginTop + plotH - h
      s"""<rect x="${fmt(x + barW * 0.15)}" y="${fmt(y)}" width="${fmt(barW * 0.7)}" height="${fmt(h)}" fill="#4878a8"/>
         |<text x="${fmt(x + barW / 2)}" y="${fmt(y - 4)}" text-anchor="middle" font-size="10">${fmt(v)}</text>
         |<text x="${fmt(x + barW / 2)}" y="${MarginTop + plotH + 14}" text-anchor="end" font-size="11" transform="rotate(-45 ${fmt(x + barW / 2)} ${MarginTop + plotH + 14})">${esc(label)}</text>""".stripMargin
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" font-family="sans-serif">
       |<text x="${W / 2}" y="28" text-anchor="middle" font-size="16">${esc(title)}</text>
       |$bars
       |</svg>""".stripMargin
  }

  /** Symmetric heatmap of (row, col, value) cells — the reference's topic
    * similarity matrix figure (LDA_Analysis.py:367-411 saves the matrix and
    * its heatmap). Missing (a,a)/(b,a) cells mirror automatically; the
    * diagonal renders 1.0.
    */
  def heatmapSvg(cells: Seq[(String, String, Double)], title: String): String = {
    require(cells.nonEmpty, "heatmap needs at least one cell")
    val keys = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
    val lookup = cells.flatMap { case (a, b, v) =>
      Seq((a, b) -> v, (b, a) -> v)
    }.toMap
    def v(a: String, b: String): Double =
      if (a == b) 1.0 else lookup.getOrElse((a, b), 0.0)
    val n = keys.size
    val plot = math.min(W - MarginLeft - MarginRight, H - MarginTop - MarginBottom)
    val cell = plot.toDouble / n
    val boxes = (for {
      (ra, i) <- keys.zipWithIndex
      (rb, j) <- keys.zipWithIndex
    } yield {
      val x = MarginLeft + j * cell
      val y = MarginTop + i * cell
      val s = math.max(0.0, math.min(1.0, v(ra, rb)))
      // light → brand blue ramp
      val (r0, g0, b0) = (238, 243, 248)
      val (r1, g1, b1) = (72, 120, 168)
      val rgb = s"rgb(${(r0 + (r1 - r0) * s).toInt},${(g0 + (g1 - g0) * s).toInt},${(b0 + (b1 - b0) * s).toInt})"
      s"""<rect x="${fmt(x)}" y="${fmt(y)}" width="${fmt(cell)}" height="${fmt(cell)}" fill="$rgb"/>
         |<text x="${fmt(x + cell / 2)}" y="${fmt(y + cell / 2 + 4)}" text-anchor="middle" font-size="10">${fmt(s)}</text>""".stripMargin
    }).mkString("\n")
    val labels = keys.zipWithIndex.map { case (k, i) =>
      val c = MarginTop + i * cell + cell / 2
      s"""<text x="${MarginLeft - 8}" y="${fmt(c + 4)}" text-anchor="end" font-size="11">${esc(k)}</text>
         |<text x="${fmt(MarginLeft + i * cell + cell / 2)}" y="${MarginTop - 8}" text-anchor="middle" font-size="11">${esc(k)}</text>""".stripMargin
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" font-family="sans-serif">
       |<text x="${W / 2}" y="24" text-anchor="middle" font-size="16">${esc(title)}</text>
       |$boxes
       |$labels
       |</svg>""".stripMargin
  }

  /** Similarity-matrix figure from (cls_a, cls_b, value) rows (K² cells). */
  def writeSimilarityHeatmap(matrix: DataFrame, path: String,
                             title: String = "Topic similarity"): Unit = {
    val cells = matrix.collect()
      .map(r => (r.get(0).toString, r.get(1).toString,
        r.get(2).toString.toDouble)).toSeq
    writeSvg(path, heatmapSvg(cells, title))
  }

  /** Word-frequency figure from a (word, freq) frame (top rows only) —
    * vertical bars, the reference's shape.
    */
  def writeWordFrequencyChart(topWords: DataFrame, path: String,
                              title: String = "Top words"): Unit = {
    val rows = topWords.collect()
      .map(r => r.getString(0) -> r.get(1).toString.toDouble).toSeq
    writeSvg(path, verticalBarChartSvg(rows, title))
  }

  /** Categorical histogram figure from a (label, count) frame — the
    * reference's dominant-topic distribution bars (LDA_Analysis.py:645-657).
    * Labels sort numerically when parseable (topic ids), else lexically.
    */
  def writeHistogramChart(hist: DataFrame, path: String,
                          title: String = "Dominant topics"): Unit = {
    val rows = hist.collect()
      .map(r => r.get(0).toString -> r.get(1).toString.toDouble).toSeq
      .sortBy { case (l, _) =>
        (scala.util.Try(l.toDouble).getOrElse(Double.MaxValue), l)
      }
    writeSvg(path, verticalBarChartSvg(rows, title))
  }

  /** Coherence-vs-k figure from a (k, score) frame. */
  def writeCoherenceCurve(grid: DataFrame, path: String,
                          title: String = "Coherence by topic count"): Unit = {
    val pts = grid.collect()
      .map(r => r.get(0).toString.toDouble -> r.get(1).toString.toDouble).toSeq
    writeSvg(path, lineChartSvg(pts, title, "topics (k)", "coherence"))
  }

  private def writeSvg(path: String, svg: String): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, svg)
  }

  /** Static-HTML report wrapper: one index.html embedding every SVG figure
    * in `dir` inline (sorted by name) — the deterministic stand-in for the
    * reference's interactive plotly HTML saves
    * (/root/reference/BERTopic_Analysis.py:730-833), which would need a
    * plotting runtime this engine deliberately avoids. Byte-reproducible
    * like the SVGs it wraps.
    */
  def writeHtmlReport(dir: String, title: String): Unit = {
    import scala.jdk.CollectionConverters._
    val d = Paths.get(dir)
    val svgs = {
      val listing = Files.list(d) // must close: each stream holds a dir handle
      try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".svg"))
        .toSeq.sortBy(_.getFileName.toString)
      finally listing.close()
    }
    val sections = svgs.map { p =>
      val name = p.getFileName.toString.stripSuffix(".svg").replace('_', ' ')
      s"""<section>\n<h2>${esc(name)}</h2>\n${Files.readString(p)}\n</section>"""
    }.mkString("\n")
    val html =
      s"""<!DOCTYPE html>
         |<html lang="en"><head><meta charset="utf-8"/>
         |<title>${esc(title)}</title>
         |<style>body{font-family:sans-serif;max-width:800px;margin:2em auto}
         |section{margin-bottom:2em}</style>
         |</head><body>
         |<h1>${esc(title)}</h1>
         |$sections
         |</body></html>""".stripMargin
    Files.writeString(d.resolve("index.html"), html)
  }
}
