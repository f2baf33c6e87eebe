package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language identification, quality scoring, token counting, document
  * fingerprinting. These generalize the reference's preprocessing stage
  * (SURVEY.md §2.8) to the operations a 100 TB corpus curation run needs.
  *
  * Everything is a codegen'd expression chain over one scan — no UDFs, no
  * shuffle until the final (small) aggregate, so each operator is
  * embarrassingly parallel across executors.
  */
object TextAnalysisOps {

  /** Marker stopwords per language for the n-gram/marker-count heuristic.
    * Deterministic, tiny, broadcast-as-literals. Single source:
    * TextKernels (the quality kernel shares the set).
    */
  val langMarkers: Map[String, Seq[String]] = graft.functions.TextKernels.langMarkers

  /** All marker words, deduped + sorted (deterministic for oracle SQL). */
  val allMarkers: Seq[String] = graft.functions.TextKernels.allMarkers

  /** Language-ID heuristic: script detection (CJK/Hangul) first, then
    * marker-word argmax with alphabetical tie-break, "und" when no signal.
    * Marker counts come from ONE kernel pass over the tokens (the four
    * interpreted isin-filter HOFs it replaces each re-walked the array).
    */
  def langIdCol(text: Column): Column = {
    val hits = graft.functions.TextExpressions.markerHitsK(tokens(text, 1, 100))
    langIdFromHits(text, hits)
  }

  private def langIdFromHits(text: Column, hits: Column): Column = {
    val langs = Seq("de", "en", "es", "fr") // alphabetical = tie-break order
    def h(i: Int) = element_at(hits, i + 1)
    val best = greatest(langs.indices.map(h): _*)
    val byMarker = langs.zipWithIndex.foldRight(lit("und")) {
      case ((l, i), acc) =>
        when(h(i) === best && best > 0, lit(l)).otherwise(acc)
    }
    when(text.rlike("[\\u4E00-\\u9FFF]"), lit("zh"))
      .when(text.rlike("[\\uAC00-\\uD7A3]"), lit("ko"))
      .otherwise(byMarker)
  }

  /** Predicted language distribution over the corpus — the hit-count array
    * is staged as a real column so the kernel runs once per row.
    */
  def langIdDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("hits", graft.functions.TextExpressions.markerHitsK(
        tokens(col("text"), 1, 100)))
      .withColumn("pred_lang", langIdFromHits(col("text"), col("hits")))
      .groupBy(col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Heuristic quality score in [0,1]: four 0.25-weight indicator components
    * (token count band, mean token length band, stopword ratio, alphanumeric
    * ratio). Indicators rather than smooth weights → integer-exact arithmetic
    * that any oracle reproduces bit-for-bit.
    */
  def qualityScoreCol(text: Column): Column =
    graft.functions.TextExpressions.qualityK(coalesce(text, lit("")))

  /** Quality score, historically over PRE-MATERIALIZED norm/toks columns;
    * now a single-pass codegen'd kernel over `text` alone (TextKernels
    * .qualityScore — bit-equivalent to the old four-HOF formulation, see
    * TextKernelsProps). The norm/toks parameters remain for source
    * compatibility with compositions that stage them for OTHER signals
    * (AssemblyOps' fingerprint/bigrams); the kernel no longer reads them.
    */
  def qualityScoreFrom(text: Column, norm: Column, toks: Column): Column =
    qualityScoreCol(text)

  /** Per-source quality profile (count, mean score, high-quality count). */
  def qualityBySource(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("text"),
        normalized(col("text")).as("norm"), tokens(col("text"), 1, 100).as("toks"))
      .select(col("source"),
        qualityScoreFrom(col("text"), col("norm"), col("toks")).as("q"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("q")), 4).as("avg_quality"),
        sum(when(col("q") >= 0.75, 1).otherwise(0)).as("n_high_quality"))

  /** Per-language token statistics: volume + vocabulary size. Two partial
    * aggregates joined on the (tiny) language key — the distinct count is its
    * own shuffle by design (exact vocabulary; approx_count_distinct is the
    * cheaper 100 TB variant).
    */
  def tokenStatsByLang(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), tokens(col("text")).as("toks"))
    val volume = docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("toks"))).as("n_tokens"),
      round(avg(size(col("toks"))), 4).as("avg_tokens"))
    val vocab = docs
      .select(col("lang"), explode(col("toks")).as("word"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("word")).as("n_distinct_words"))
    volume.join(vocab, Seq("lang"))
  }

  /** Duplicate fraction of an array: 1 − distinct/total (0 for empty).
    * Narrow array arithmetic — no explode, no shuffle.
    */
  def dupFrac(items: Column): Column =
    when(size(items) > 0,
      lit(1.0) - size(array_distinct(items)).cast("double")
        / size(items).cast("double"))
      .otherwise(lit(0.0))

  /** Adjacent token bigrams ("a b") of a token array; empty below 2 tokens.
    *
    * Shape matters here: the earlier `transform(sequence(...), i =>
    * element_at(toks, i) ...)` form re-evaluated the WHOLE `toks`
    * expression once per element whenever the caller inlined a computed
    * array (withColumn collapse into a Filter has no subexpression cache)
    * — O(tokens²) tokenizer kernel calls per row, measured 113 s vs 1.5 s
    * on a 50k-doc filter. `zip_with` over two `slice`s evaluates the input
    * arrays ONCE and then iterates, so the cost is linear no matter how
    * the caller composes it.
    */
  def tokenBigrams(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))

  /** Per-source repetition profile — the duplicate-token and
    * duplicate-bigram fractions of the Gopher repetition-filter family
    * (Rae et al. 2021, "Scaling Language Models", Table A1: docs whose
    * repeated n-grams exceed a threshold are dropped before training).
    * `n_flagged` counts docs past the 0.2 duplicate-bigram bar. Pure
    * per-row array arithmetic + one aggregate: scan-shaped at any corpus
    * size.
    */
  def repetitionBySource(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), tokens(col("text"), 1, 100).as("toks"))
      .select(col("source"),
        dupFrac(col("toks")).as("dup_tok"),
        dupFrac(tokenBigrams(col("toks"))).as("dup_big"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("dup_tok")), 4).as("avg_dup_token_frac"),
        round(avg(col("dup_big")), 4).as("avg_dup_bigram_frac"),
        sum(when(col("dup_big") > 0.2, 1).otherwise(0)).as("n_flagged"))

  /** BPE-ish subword counting: runs of one character class (digits, Latin,
    * Hangul, other-symbol runs) over the lowercased text, each run costing
    * ceil(len/8) tokens — the bounded-piece behavior of a real BPE vocab
    * without shipping one. The pattern is deliberately RE2-safe (no
    * lookarounds) so any engine reproduces it. chars/4 is the usual quick
    * estimate, kept alongside for calibration.
    */
  val BpeishPattern = "[0-9]+|[a-z]+|[가-힣]+|[^a-z0-9가-힣\\s]+"

  def bpeishTokenCount(text: Column): Column =
    graft.functions.TextExpressions.bpeishK(coalesce(text, lit("")))

  /** Per-source token-budget profile: whitespace tokens vs BPE-ish subword
    * count vs the chars/4 estimate.
    */
  def tokenBudgetBySource(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        size(tokens(col("text"), 1, 100)).as("ws"),
        bpeishTokenCount(col("text")).as("bpe"),
        ceil(length(coalesce(col("text"), lit(""))) / 4.0).as("est"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpeish_tokens"),
        sum(col("est")).as("est_tokens"))

  /** Document fingerprints: md5 of the normalized text (content-defined
    * identity) + a 31-ary polynomial rolling hash over code points (cheap,
    * incremental, oracle-reproducible). Partitioning/joining on the
    * fingerprint instead of the full text is the 100 TB dedup path.
    */
  def withFingerprints(docs: DataFrame, textCol: String): DataFrame = {
    val norm = normalized(col(textCol))
    val p = lit(1000000007L)
    docs
      .withColumn("fp_md5", md5(norm.cast("binary")))
      .withColumn("fp_set",
        md5(concat_ws(" ",
          array_sort(array_distinct(tokens(col(textCol))))).cast("binary")))
      .withColumn("fp_roll",
        aggregate(
          transform(filter(split(norm, ""), c => c =!= ""),
            c => ascii(c).cast("long")),
          lit(7L),
          (acc, x) => (acc * 31L + x) % p))
  }

  /** Duplicate clusters by bag-of-words fingerprint (md5 of the sorted
    * distinct token set): catches reordered/near-identical documents that
    * byte-exact dedup misses, still one groupBy shuffle on a 32-byte key.
    */
  def duplicateClusters(spark: SparkSession, dir: String): DataFrame =
    withFingerprints(Tables.documents(spark, dir), "text")
      .groupBy(col("fp_set"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .filter(col("n_docs") > 1)

  /** Rolling-hash fingerprint sample rows (oracle-checkable exact values). */
  def fingerprintSample(spark: SparkSession, dir: String): DataFrame =
    withFingerprints(Tables.documents(spark, dir), "text")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("fp_md5"), col("fp_roll"))
}
