package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact order statistics WITHOUT a global sort — the broadcast-CDF pattern.
  *
  * A global rank (`percent_rank() OVER (ORDER BY x)`) or an exact median
  * compiles to a single-partition sort of the whole input: a non-starter at
  * 100 TB (one task sorts everything) and the reason most pipelines settle
  * for approximate quantiles. But when the ranked value has BOUNDED
  * CARDINALITY — document length, a score on a fixed grid, a date — the
  * exact answer needs no data sort at all:
  *
  *   1. `groupBy(value).count()` → a histogram frame with one row per
  *      DISTINCT value (map-side combined; shuffle carries the grid, not
  *      the rows).
  *   2. A window over THAT tiny frame (|distinct values| rows, the only
  *      unpartitioned sort anywhere) turns counts into a CDF.
  *   3. The CDF broadcasts back onto the rows — a map-side join, no
  *      shuffle of the data — and every rank statistic is a closed-form
  *      expression of (n_below, n_value, n_total).
  *
  * This is the EXACT tier next to `SketchOps.histogramSketch`'s approximate
  * one: use this when the value grid fits a broadcast (≤ ~10⁶ distinct
  * values); bucket first (falling back to the sketch) when it doesn't.
  * Rank semantics match ANSI windows: `percent_rank = (rank−1)/(n−1)` with
  * rank counting strictly-smaller rows + 1, `cume_dist = rows ≤ value / n`.
  * Rows with a NULL value are excluded, as ANSI ordering would place them
  * in a bucket of their own anyway.
  *
  * The reference ranks documents by length/score only via full pandas sorts
  * (/root/reference/BERTopic_Analysis.py:700-705); this is the shape that
  * survives the scale-up.
  */
object RankOps {

  /** Attach exact `pct_rank` and `cume_dist` for `valueCol` to every row of
    * `df`, via the histogram CDF (no sort of `df` itself). NULL values drop.
    */
  def rankByCdf(df: DataFrame, valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("cdf_n"))
    // The only unpartitioned window: |distinct valueCol| rows, never data.
    // The grand total rides the SAME frame as an unbounded window sum, so
    // one histogram aggregate feeds both the CDF and the total — a second
    // independent `counts.agg(...)` subtree would re-scan the input and
    // recompute the aggregate (broadcast exchanges differ, so Spark
    // wouldn't reuse them).
    val below = Window.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cdf = counts
      .withColumn("cdf_below", coalesce(sum(col("cdf_n")).over(below), lit(0L)))
      .withColumn("cdf_total", sum(col("cdf_n")).over(whole))
    df.join(broadcast(cdf), valueCol)
      .withColumn("pct_rank",
        when(col("cdf_total") === 1, lit(0.0))
          .otherwise(col("cdf_below").cast("double") / (col("cdf_total") - 1)))
      .withColumn("cume_dist",
        (col("cdf_below") + col("cdf_n")).cast("double") / col("cdf_total"))
      .drop("cdf_n", "cdf_below", "cdf_total")
  }

  /** Exact per-group median of `valueCol` (ANSI interpolating: even group
    * sizes average the two middle values), from per-group histograms — the
    * per-key windows run over the (key, distinct value) frame only. NULLs
    * drop, matching SQL `median`.
    */
  def groupedMedian(df: DataFrame, keyCol: String, valueCol: String,
                    out: String = "median"): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol)).agg(count(lit(1)).as("mn"))
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(valueCol))
    val cum = counts
      .withColumn("cum", sum(col("mn")).over(byKey))
      .withColumn("nk", sum(col("mn")).over(Window.partitionBy(col(keyCol))))
    // Middle positions (1-based): lo = ceil(n/2), hi = floor(n/2)+1; the
    // value at position p is the least value whose cumulative count ≥ p.
    val lo = ((col("nk") + 1) / 2).cast("long")
    val hi = (col("nk") / 2).cast("long") + 1
    cum.groupBy(col(keyCol)).agg(
      ((min(when(col("cum") >= lo, col(valueCol))) +
        min(when(col("cum") >= hi, col(valueCol)))) / 2.0).as(out))
  }

  /** Exact per-group quantiles (ANSI `percentile_cont` / type-7: h =
    * (n−1)q + 1, linear interpolation between the order statistics at
    * ⌊h⌋ and ⌈h⌉) from the same per-group histograms. Spark's own exact
    * `percentile` aggregate buffers EVERY value of a group on one reducer
    * — the formulation that dies on a 100 TB group; this one touches only
    * (key, distinct value) rows after the histogram aggregate. All
    * requested quantiles come out of the same two aggregates, one column
    * each.
    */
  def groupedQuantiles(df: DataFrame, keyCol: String, valueCol: String,
                       qs: Seq[(String, Double)]): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol)).agg(count(lit(1)).as("qn"))
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(valueCol))
    val cum = counts
      .withColumn("cum", sum(col("qn")).over(byKey))
      .withColumn("nk", sum(col("qn")).over(Window.partitionBy(col(keyCol))))
    val aggsPerQ = qs.flatMap { case (name, q) =>
      val h = (col("nk") - 1) * q + 1 // 1-based fractional rank
      val lo = floor(h).cast("long")
      Seq(
        min(when(col("cum") >= lo, col(valueCol))).as(s"${name}_lo"),
        min(when(col("cum") >= lo + 1, col(valueCol))).as(s"${name}_hi"),
        min(h - lo).as(s"${name}_frac")) // constant per key (min = the value)
    }
    val raw = cum.groupBy(col(keyCol)).agg(aggsPerQ.head, aggsPerQ.tail: _*)
    qs.foldLeft(raw) { case (acc, (name, _)) =>
      acc.withColumn(name,
        col(s"${name}_lo") + col(s"${name}_frac") *
          (coalesce(col(s"${name}_hi"), col(s"${name}_lo")) - col(s"${name}_lo")))
        .drop(s"${name}_lo", s"${name}_hi", s"${name}_frac")
    }
  }

  /** Query: document-length decile profile from exact percent ranks — the
    * rank/CDF numbers a curation pass thresholds on, grouped so the output
    * stays 10 rows at any corpus size.
    */
  def pctRankProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "n_chars")
    rankByCdf(docs, "n_chars")
      .withColumn("decile",
        least(floor(col("pct_rank") * 10), lit(9)).cast("long"))
      .groupBy(col("decile")).agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).cast("long").as("min_chars"),
        max(col("n_chars")).cast("long").as("max_chars"),
        round(avg(col("pct_rank")), 4).as("avg_pct_rank"),
        round(avg(col("cume_dist")), 4).as("avg_cume_dist"))
      .orderBy(col("decile"))
  }

  /** Query: exact per-language length quantiles, sort-free — the exact
    * twin of `txt_len_quantiles`' sketch estimates.
    */
  def quantileProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("lang", "n_chars")
    val qs = Seq("q25" -> 0.25, "q50" -> 0.5, "q75" -> 0.75, "q95" -> 0.95)
    val quant = groupedQuantiles(docs, "lang", "n_chars", qs)
    val rounded = qs.foldLeft(quant) { case (acc, (name, _)) =>
      acc.withColumn(name, round(col(name), 4))
    }
    // n_docs counts only rows the quantiles see (non-null values) — the
    // oracle's WHERE clause; an unfiltered count would diverge on any
    // corpus with null lengths.
    docs.filter(col("n_chars").isNotNull)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .join(broadcast(rounded), "lang")
      .orderBy(col("lang"))
  }

  /** Query: exact per-language length stats incl. the sort-free median. */
  def medianProfile(spark: SparkSession, dir: String): DataFrame = {
    // same null discipline as quantileProfile: stats cover exactly the rows
    // the median sees, matching the oracle's WHERE clause
    val docs = Tables.documents(spark, dir).select("lang", "n_chars")
      .filter(col("n_chars").isNotNull)
    val stats = docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      min(col("n_chars")).cast("long").as("min_chars"),
      max(col("n_chars")).cast("long").as("max_chars"))
    val med = groupedMedian(docs, "lang", "n_chars", out = "median_chars")
      .withColumn("median_chars", round(col("median_chars"), 1))
    stats.join(broadcast(med), "lang").orderBy(col("lang"))
  }
}
