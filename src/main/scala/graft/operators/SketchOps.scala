package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.HashExpressions.rollingHash

/** Mergeable frequency sketches — the approximate counting tier a 100 TB
  * word-frequency surface needs when even the (word, count) table is too
  * wide to materialize (SURVEY.md §2.5 A1's scale escape hatch; the brief's
  * "novel sketch" custom-operator family).
  *
  * Count-min sketch as a plain DataFrame program: depth×width counter grid,
  * row i bucketing each token by the engine's affine hash family
  * h_i(x) = (8191·i·x + 524287·i) mod P (the MinHash family,
  * HashKernels.minhashSig) folded onto `width` buckets. Every step is
  * integer arithmetic on codegen'd expressions, so the sketch — and the
  * estimates read from it — are bit-reproducible in the DuckDB oracle.
  *
  * Properties the plan keeps at scale: ONE explode+groupBy over (i, bucket)
  * — depth·width rows out regardless of vocabulary size; sketches of
  * partitions/days/shards merge by cell-wise addition (the groupBy IS the
  * merge); estimates are upper bounds (min over rows) with the usual
  * ε = e/width, δ = e^-depth guarantees.
  */
object SketchOps {

  val P = 1000000007L

  /** Build the sketch: (row, bucket, n) counters from one corpus scan. */
  def countMinSketch(docs: DataFrame, textCol: String,
                     depth: Int = 4, width: Int = 1024): DataFrame = {
    val rows = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .select(rollingHash(col("word")).as("h"))
      .select(explode(expr(
        s"transform(sequence(1, $depth), i -> named_struct(" +
          s"'row', i, 'bucket', ((h * (8191 * i)) + (524287 * i)) % $P % $width))"))
        .as("cell"))
      .select(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
    rows.groupBy("row", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Point estimates for `words` from a sketch: min over rows of the
    * word's bucket counter — always ≥ the true count.
    */
  def countMinEstimate(sketch: DataFrame, words: DataFrame, wordCol: String,
                       depth: Int = 4, width: Int = 1024): DataFrame = {
    val keyed = words
      .withColumn("h", rollingHash(col(wordCol)))
      .select(col(wordCol).as("word"), explode(expr(
        s"transform(sequence(1, $depth), i -> named_struct(" +
          s"'row', i, 'bucket', ((h * (8191 * i)) + (524287 * i)) % $P % $width))"))
        .as("cell"))
      .select(col("word"), col("cell.row").as("row"), col("cell.bucket").as("bucket"))
    keyed
      .join(sketch, Seq("row", "bucket"), "left")
      .groupBy("word")
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }

  /** Linear-counting distinct sketch: an m-bucket occupancy bitmap over the
    * token hash — distinct-count estimate −m·ln(V) where V = empty fraction
    * (Whang et al. 1990). Mergeable by bitmap OR (union of occupied
    * buckets); deterministic arithmetic end-to-end, so oracle-exact.
    */
  def occupiedBuckets(docs: DataFrame, textCol: String,
                      m: Int = 4096): DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("word"))
      .select((rollingHash(col("word")) % lit(m)).as("bucket"))
      .distinct()

  /** Query: linear-counting distinct-words estimate vs the exact count —
    * (n_exact, occupied, est); est within ~2% at this load factor.
    */
  def distinctSketch(spark: SparkSession, dir: String): DataFrame = {
    val m = 4096
    val docs = Tables.documents(spark, dir)
    val words = docs.select(explode(tokens(col("text"))).as("word"))
    val occupied = occupiedBuckets(docs, "text", m)
      .agg(count(lit(1)).as("occupied"))
    words.agg(countDistinct(col("word")).as("n_exact"))
      .crossJoin(broadcast(occupied))
      .withColumn("est",
        round(-lit(m.toDouble) * log((lit(m) - col("occupied")) / lit(m.toDouble)), 4))
  }

  /** Fixed-width histogram sketch over a numeric column: (bucket, n) with
    * bucket = value div width. Mergeable by cellwise addition like the
    * count-min grid; size is bounded by value-range/width, independent of
    * row count — the property that lets quantile reads stay cheap at any
    * corpus size.
    */
  def histogramSketch(df: DataFrame, valueCol: String, width: Int): DataFrame =
    df.select(expr(s"CAST($valueCol AS BIGINT) div $width").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** Quantile estimates read from a histogram sketch: rank = ceil(q·N),
    * walk the cumulative histogram to the covering bucket, interpolate
    * linearly inside it. Deterministic arithmetic → exact oracle. The
    * cumulative window runs over the SKETCH (bounded by construction), not
    * the data.
    */
  def quantileEstimates(sketch: DataFrame, width: Int,
                        qs: Seq[Double]): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val cum = sketch.withColumn("cum_before",
      coalesce(sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.orderBy("bucket")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
    val ranked = qs.toDF("q")
      .crossJoin(broadcast(sketch.agg(sum(col("n")).as("total"))))
      .withColumn("rank", ceil(col("q") * col("total")).cast("long"))
    cum.join(broadcast(ranked),
        col("cum_before") < col("rank") && col("rank") <= col("cum_before") + col("n"))
      .select(col("q"),
        round(col("bucket") * width +
          lit(width) * (col("rank") - col("cum_before")) / col("n"), 4).as("est"),
        col("total"))
  }

  /** Query: document-length quantiles (p50/p90/p99 of n_chars) estimated
    * from a width-64 histogram sketch — one scan builds the sketch, the
    * estimates read only sketch rows.
    */
  def lengthQuantiles(spark: SparkSession, dir: String): DataFrame =
    quantileEstimates(
      histogramSketch(Tables.documents(spark, dir), "n_chars", 64),
      64, Seq(0.5, 0.9, 0.99))
      .select(col("q"), col("est").as("est_chars"), col("total").as("n_docs"))

  /** Query: count-min estimates vs exact counts for the corpus top-10 words
    * — `est >= freq` always; equality whenever the word's buckets are
    * collision-free. Both sides integer arithmetic → exact oracle.
    */
  def countMinTopWords(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sketch = graft.Caching.track(countMinSketch(docs, "text"))
    val top = WordFreqOps.topWords(docs, "text", 10)
    countMinEstimate(sketch, top, "word")
      .join(top, "word")
      .select(col("word"), col("freq"), col("est"))
      .orderBy(desc("freq"), col("word"))
  }
}
