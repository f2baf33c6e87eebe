package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Stage-1 document preparation (reference EP1, SURVEY.md §3):
  * dedup → null/short drop → derived columns → cleaned text.
  *
  * Reference semantics being reproduced:
  *   - D1 keep-FIRST dedup on the content column (preprocessing.py:344-346):
  *     pandas `drop_duplicates(keep='first')` keeps the lowest original index;
  *     here `row_number() over (partition by text order by doc_id)` = 1. One
  *     shuffle, partitioned by the dedup key — at 100 TB the key is the text
  *     itself, so the fingerprint variant (TextAnalysisOps.fingerprints) that
  *     partitions on a 128-bit hash is the scale path.
  *   - P3/P4 null-drop + min-length predicate (preprocessing.py:349-350,
  *     LDA_Analysis.py:129: `len > 10`).
  *   - P5 derived concat column (preprocessing.py:353).
  *   - F1/F2 cleaned text (preprocessing.py:374).
  */
object DocPrep {

  /** Keep-first deduplication by `key`, "first" = smallest `order` value. */
  def dedupKeepFirst(df: DataFrame, key: String, order: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(order).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full prep pipeline over the documents fixture. */
  def prepare(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    dedupKeepFirst(docs, "text", "doc_id")
      .filter(col("text").isNotNull && length(trim(col("text"))) > 10)
      .withColumn("source_text", trim(concat_ws(" ",
        coalesce(col("source"), lit("")), coalesce(col("text"), lit("")))))
      .withColumn("cleaned_text", cleanText(col("text")))
  }

  /** Prep summary for oracle comparison: per-language counts and extrema
    * after dedup + filtering (the reference's 분석요약 sheet analogue, A2/A11).
    */
  def prepSummary(spark: SparkSession, dir: String): DataFrame =
    prepare(spark, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        sum(col("n_chars")).as("sum_chars"),
        round(avg(length(col("text"))), 4).as("avg_len"))
}
