package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.tokens

/** Vocabulary induction over a training corpus — the tokenizer-side
  * operators a data pipeline runs before any model sees a byte: which
  * adjacent units should merge (the counting round at the heart of BPE
  * training, Sennrich et al. 2016, here at word level over the engine's
  * token chain), and how much of the corpus a fixed-size vocabulary
  * actually covers (the OOV-rate gauge that decides the vocab budget).
  * The reference's vocabulary handling is gensim's in-memory Dictionary
  * (/root/reference/LDA_Analysis.py:160-168) — these are the same
  * decisions as scale-safe relational plans.
  *
  * Scale shape: pair counting is one in-plan transform (no token strings
  * leave their row until the explode) + one map-side-combined aggregate;
  * the top-k never global-sorts (TakeOrdered). Coverage builds the
  * vocabulary as a k-row frame, BROADCASTS it, and scans the corpus once —
  * the corpus never shuffles on the word.
  */
object VocabOps {

  /** Adjacent-token pair counts — one BPE-style merge-candidate round.
    * Pairs materialize as "w1 w2" strings only inside the explode.
    */
  def mergePairCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1))))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))

  /** Query: the top 50 merge candidates by corpus frequency. */
  def mergePairsQuery(spark: SparkSession, dir: String): DataFrame =
    mergePairCounts(Tables.documents(spark, dir), "text")
      .orderBy(col("n").desc, col("pair"))
      .limit(50)

  /** Per-group coverage of a top-`vocabSize` vocabulary: token occurrences
    * covered vs total, and the OOV rate. The vocabulary is selected by
    * global frequency (ties to the lexicographically smaller token, so the
    * cut is deterministic at any scale).
    */
  def vocabCoverage(docs: DataFrame, textCol: String, groupCol: String,
                    vocabSize: Int): DataFrame = {
    val tok = docs.select(col(groupCol),
      explode(tokens(col(textCol))).as("word"))
    val vocab = tok.groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .orderBy(col("wf").desc, col("word"))
      .limit(vocabSize)
      .select(col("word"), lit(1).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("in_vocab"), lit(0))).cast("long").as("n_covered"))
      .withColumn("oov_rate",
        round(lit(1.0) - col("n_covered").cast("double") / col("n_tokens"), 4))
  }

  /** Query: per-language coverage of the global top-1000 vocabulary. */
  def coverageQuery(spark: SparkSession, dir: String): DataFrame =
    vocabCoverage(Tables.documents(spark, dir), "text", "lang", 1000)
      .orderBy(col("lang"))
}
