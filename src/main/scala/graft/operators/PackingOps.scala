package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysisOps.bpeishTokenCount

/** Sequence packing: concatenate a corpus in stable id order and cut it
  * into fixed token-budget training sequences, at document granularity —
  * each doc lands in the sequence where its first token falls (a long doc
  * spills past its sequence's budget rather than splitting).
  *
  * The core is a distributed prefix sum. A naive
  * `sum() over (order by id)` puts the whole corpus in ONE window
  * partition — the scale-killer this module exists to avoid. Instead the
  * classic two-level scan: coarse id-ranges are prefix-summed (tiny frame —
  * corpus_size / rangeSize rows), then each range computes its local
  * cumulative sum in a bounded window partition and adds its range offset.
  * Shuffle cost: one groupBy over ranges + one bounded window; the range
  * offsets broadcast.
  */
object PackingOps {

  /** Per-doc packing assignment: (doc_id, n_tokens, start, seq_id) where
    * `start` is the doc's first-token offset in the id-ordered concatenated
    * token stream and seq_id = start div budget.
    *
    * `rangeSize` is the id width of a coarse range: ranges must be small
    * enough that one range's rows fit a window partition and numerous
    * enough that the range-offset frame stays tiny (corpus/rangeSize rows).
    */
  def packSequences(docs: DataFrame, idCol: String, tokensExpr: Column,
                    budget: Int, rangeSize: Long = 4096): DataFrame = {
    val perDoc = docs.select(
      col(idCol).cast("long").as("doc_id"),
      tokensExpr.cast("long").as("n_tokens"),
      // integer div, not /-then-truncate: ids above 2^53 would lose
      // precision through the double division
      expr(s"CAST($idCol AS BIGINT) div $rangeSize").as("rng"))
    // level 1: range totals, prefix-summed — corpus/rangeSize rows, so the
    // unpartitioned window here is over a deliberately tiny frame
    val offsets = perDoc.groupBy(col("rng"))
      .agg(sum(col("n_tokens")).as("rng_tokens"))
      .withColumn("rng_offset",
        coalesce(sum(col("rng_tokens")).over(
          Window.orderBy("rng").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("rng_tokens")
    // level 2: local cumulative sum within each bounded range partition
    val local = Window.partitionBy("rng").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDoc
      .join(broadcast(offsets), "rng")
      .withColumn("start",
        col("rng_offset") + sum(col("n_tokens")).over(local) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("start"),
        expr(s"start div $budget").as("seq_id"))
  }

  /** Token-granularity packing: the concatenated stream is cut at EXACTLY
    * every `budget` tokens, so every sequence is full except the last and
    * docs crossing a boundary are split across sequences — the GPT-style
    * packing that wastes zero context. One row per (doc, covered
    * sequence) with that sequence's share of the doc's tokens. The
    * explode averages ~1 row/doc (a doc covers extra sequences only by
    * crossing boundaries), so the plan stays scan-shaped on top of the
    * same two-level prefix sum.
    */
  def packChunks(docs: DataFrame, idCol: String, tokensExpr: Column,
                 budget: Int, rangeSize: Long = 4096): DataFrame =
    packSequences(docs, idCol, tokensExpr, budget, rangeSize)
      .filter(col("n_tokens") > 0)
      .withColumn("fin", col("start") + col("n_tokens"))
      .select(col("doc_id"), col("start"), col("fin"),
        explode(sequence(expr(s"start div $budget"),
          expr(s"(fin - 1) div $budget"))).as("seq_id"))
      .withColumn("tokens_in_seq",
        least(col("fin"), (col("seq_id") + 1) * budget)
          - greatest(col("start"), col("seq_id") * budget))

  /** PER-DOC sliding-window chunking (RAG/eval prep, vs the cross-doc
    * packing above): windows of `window` tokens at `stride` steps; the
    * final window clamps to end exactly at the doc's last token, so every
    * chunk is full-size (or the whole doc when shorter) and coverage is
    * total with overlap ≥ window − stride. Pure per-row arithmetic + a
    * bounded explode (≈ t/stride rows per doc) — no shuffle, no state; the
    * plan is scan-shaped at any corpus size.
    */
  def slidingChunks(docs: DataFrame, idCol: String, tokensExpr: Column,
                    window: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= window, "need 0 < stride <= window")
    docs
      .withColumn("t", tokensExpr)
      .filter(col("t") > 0)
      .withColumn("k", when(col("t") <= window, lit(1L))
        .otherwise(expr(s"(t - $window + $stride - 1) div $stride") + 1L))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), col("k") - 1)))
      .withColumn("start",
        when(col("chunk_idx") === col("k") - 1,
          greatest(col("t") - window, lit(0L)))
          .otherwise(col("chunk_idx") * stride))
      .withColumn("chunk_len", least(col("t"), lit(window.toLong)))
  }

  /** Query: 512-token windows at stride 384 (25% overlap) — per-lang doc,
    * chunk, and token counts plus the emitted-token duplication factor the
    * overlap costs.
    */
  def slidingChunkProfile(spark: SparkSession, dir: String): DataFrame =
    slidingChunks(Tables.documents(spark, dir), "doc_id",
      bpeishTokenCount(col("text")), window = 512, stride = 384)
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("chunk_idx") === 0, col("t")).otherwise(0L)).as("n_tokens"),
        sum(col("chunk_len")).as("n_emitted"),
        round(sum(col("chunk_len")).cast("double") /
          sum(when(col("chunk_idx") === 0, col("t")).otherwise(0L)), 4)
          .as("dup_factor"))
      .orderBy(col("lang"))

  /** Query: token-exact chunk profile — every sequence carries exactly the
    * 2048 budget except the final one; `n_continued` counts docs continuing
    * across the left boundary.
    */
  def chunkProfile(spark: SparkSession, dir: String): DataFrame =
    packChunks(Tables.documents(spark, dir), "doc_id",
      bpeishTokenCount(col("text")), budget = 2048, rangeSize = 256)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens_in_seq")).as("n_tokens"),
        sum(when(col("start") < col("seq_id") * 2048, 1).otherwise(0))
          .as("n_continued"))

  /** Query: pack the documents fixture into 2048-token sequences (BPE-ish
    * token counts) — per-sequence doc count, token fill, and id span. Fill
    * hovers at the budget except the final partial sequence and sequences
    * entered by a spilling long doc.
    */
  def packProfile(spark: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(spark, dir), "doc_id",
      bpeishTokenCount(col("text")), budget = 2048, rangeSize = 256)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
}
