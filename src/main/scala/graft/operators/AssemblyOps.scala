package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.tokens

/** The end-to-end training-set assembly pipeline, composed from the
  * engine's own operators — the query a 100 TB ingest actually runs:
  *
  *   exact dedup (keep-first by content fingerprint)
  *     → quality + repetition gate (qualityScoreCol ≥ 0.5, Gopher
  *       duplicate-bigram fraction ≤ 0.2)
  *     → deterministic train/val/test split (90/5/5 by id hash)
  *     → per-split doc and token accounting.
  *
  * Every stage is deterministic arithmetic, so the WHOLE pipeline sits
  * under one exact DuckDB oracle. Plan shape: one shuffle for the
  * fingerprint dedup window, one for the final 3-group aggregate —
  * everything between is narrow.
  */
object AssemblyOps {

  /** Query: per-split profile of the assembled training set. */
  def trainAssembly(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // keep-first: window over the fingerprint (partitions bounded by
    // duplicate multiplicity), not groupBy-min + self-join (two shuffles)
    val keepFirst = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val surviving = graft.streaming.StreamOps.withFingerprint(docs, "text")
      .withColumn("rn", row_number().over(keepFirst))
      .filter(col("rn") === 1)
      .withColumn("q", TextAnalysisOps.qualityScoreCol(col("text")))
      .withColumn("dup_big",
        TextAnalysisOps.dupFrac(
          TextAnalysisOps.tokenBigrams(tokens(col("text"), 1, 100))))
      .filter(col("q") >= 0.5 && col("dup_big") <= 0.2)
    SamplingOps.assignSplits(surviving, "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysisOps.bpeishTokenCount(col("text"))).as("n_tokens"),
        round(avg(col("q")), 4).as("avg_quality"))
  }
}
