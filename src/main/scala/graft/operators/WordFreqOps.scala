package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** The reference's flagship query (EP1 / SURVEY.md §2.5 A1 + §2.6 W1):
  * corpus-wide word frequency, top-N.
  *
  * Plan shape: parquet scan (text column only — column pruning) →
  * codegen'd tokenize (split/filter HOFs, no UDF) → explode → hash
  * aggregate with map-side partial combine → TakeOrderedAndProject.
  * One shuffle total; the limit never materializes a global sort, so the
  * same plan holds at 100 TB (partial top-N per partition, merged on the
  * driver for the final N rows).
  *
  * Ordering is fully deterministic (freq desc, word asc) so golden/oracle
  * comparisons are stable under ties.
  */
object WordFreqOps {

  def wordCounts(docs: DataFrame, textCol: String,
                 stopwords: Seq[String] = Nil): DataFrame =
    docs
      .select(explode(removeStopwords(tokens(col(textCol)), stopwords)).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  def topWords(docs: DataFrame, textCol: String, n: Int,
               stopwords: Seq[String] = Nil): DataFrame =
    wordCounts(docs, textCol, stopwords)
      .orderBy(col("freq").desc, col("word").asc)
      .limit(n)

  /** Flagship: top-100 words over the documents fixture. */
  def topWordsQuery(spark: SparkSession, dir: String): DataFrame =
    topWords(Tables.documents(spark, dir), "text", 100)

  /** Word-frequency distribution stats (reference A2 stats block:
    * mean/median/stddev/extrema over the frequency table itself).
    */
  def wordFreqStats(spark: SparkSession, dir: String): DataFrame =
    wordCounts(Tables.documents(spark, dir), "text")
      .agg(
        count(lit(1)).as("n_words"),
        round(avg(col("freq")), 4).as("mean_freq"),
        round(expr("median(freq)"), 4).as("median_freq"),
        round(stddev_samp(col("freq")), 4).as("std_freq"),
        max(col("freq")).as("max_freq"),
        min(col("freq")).as("min_freq"))
}
