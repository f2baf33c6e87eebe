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

  /** Query: per-split profile of the assembled training set.
    *
    * All per-row signals (fingerprint, quality, repetition, token count)
    * are computed ONCE in the scan-side projection BELOW the dedup window,
    * and `text` is dropped before the exchange. Two wins that matter:
    * the shuffle carries ~40 bytes/doc of numerics instead of the document
    * body, and the gate above the window filters plain columns — putting
    * the gate expressions after the window instead lets predicate pushdown
    * and project-collapse inline the (interpreted, HOF-based) quality and
    * repetition expressions into the filter and every aggregate, evaluating
    * tokens(text) ~24× per row (measured 76 s vs 4 s at sf0.1). A filter on
    * non-partition columns cannot push through the Window, so the
    * projection boundary is stable.
    */
  def trainAssembly(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // stage norm/toks as REAL columns: every signal below reuses them, and
    // CollapseProject keeps the boundary (non-cheap aliases used more than
    // once are not re-inlined), so the tokenize runs once per row
    val staged = docs.select(col("doc_id"), col("text"),
      graft.functions.TextFunctions.normalized(col("text")).as("norm"),
      tokens(col("text"), 1, 100).as("toks"))
    val perDoc = staged.select(col("doc_id"),
      graft.functions.HashExpressions.rollingHash(col("norm")).as("fp"),
      TextAnalysisOps.qualityScoreFrom(col("text"), col("norm"), col("toks")).as("q"),
      TextAnalysisOps.dupFrac(
        TextAnalysisOps.tokenBigrams(col("toks"))).as("dup_big"),
      TextAnalysisOps.bpeishTokenCount(col("text")).as("bpe"))
    // keep-first: window over the fingerprint (partitions bounded by
    // duplicate multiplicity), not groupBy-min + self-join (two shuffles)
    val keepFirst = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val surviving = perDoc
      .withColumn("rn", row_number().over(keepFirst))
      .filter(col("rn") === 1 && col("q") >= 0.5 && col("dup_big") <= 0.2)
    SamplingOps.assignSplits(surviving, "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bpe")).as("n_tokens"),
        round(avg(col("q")), 4).as("avg_quality"))
  }
}
