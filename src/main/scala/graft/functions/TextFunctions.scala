package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives (reference SURVEY.md §2.8 F1–F12).
  *
  * Everything here is a composition of codegen'd built-ins — no UDFs — so the
  * whole text pipeline stays inside WholeStageCodegen and scales linearly with
  * executor count. Semantics follow the reference's preprocessing
  * (`/root/reference/preprocessing.py:206-284`):
  *   - cleanText  keeps Korean (가-힣), ASCII alphanumerics and whitespace,
  *     collapses runs of whitespace, trims, and maps null → "".
  *   - normalizeAi rewrites the standalone word "ai"/"AI" (and then any
  *     remaining literal occurrences) to 인공지능, preserving the reference's
  *     3-step order.
  *   - tokens splits on whitespace and keeps tokens of a length range
  *     (`preprocessing.py:266-277`, `LDA_Analysis.py:159-161`).
  */
object TextFunctions {

  /** F1 — strip non-text chars, collapse whitespace, trim; null-safe. */
  def cleanText(c: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(coalesce(c, lit("")), "[^가-힣a-zA-Z0-9\\s]", ""),
        "\\s+", " "))

  /** F2 — normalize the word AI → 인공지능 (reference preprocessing.py:279-284). */
  def normalizeAi(c: Column): Column = {
    val wordBound = regexp_replace(c, "(?i)\\bai\\b", "인공지능")
    val upper = regexp_replace(wordBound, "AI", "인공지능")
    regexp_replace(upper, "ai", "인공지능")
  }

  /** Canonical normalization used by the analytics queries: lowercase and
    * squash every non-alphanumeric (keeping Korean) run to one space.
    */
  def normalized(c: Column): Column =
    trim(regexp_replace(lower(coalesce(c, lit(""))), "[^a-z0-9가-힣]+", " "))

  /** F3/F5/P7 — whitespace tokens of `normalized`, keeping lengths in
    * [minLen, maxLen]. Backed by the single-pass TextKernels.tokens
    * codegen'd expression (the split+ArrayFilter HOF chain it replaces is
    * CodegenFallback — interpreted per element; TextKernelsProps pins
    * bit-equivalence between the two).
    */
  def tokens(c: Column, minLen: Int = 2, maxLen: Int = 15): Column =
    TextExpressions.tokensK(coalesce(c, lit("")), minLen, maxLen)

  /** Korean-only token extraction (reference's simple analyzer,
    * preprocessing.py:266-277): runs of 가-힣, min length 2.
    */
  def koreanTokens(c: Column, minLen: Int = 2): Column =
    filter(
      split(trim(regexp_replace(coalesce(c, lit("")), "[^가-힣]+", " ")), " "),
      t => length(t) >= minLen)

  /** P8 — drop tokens present in a stopword array column/literal. */
  def removeStopwords(toks: Column, stopwords: Seq[String]): Column =
    if (stopwords.isEmpty) toks
    else filter(toks, t => !t.isin(stopwords: _*))

  /** P8 substring variant (BERTopic_Analysis.py:702-705): drop tokens that
    * CONTAIN any stopword as a substring.
    */
  def removeStopwordsSubstring(toks: Column, stopwords: Seq[String]): Column =
    if (stopwords.isEmpty) toks
    else {
      val sw = array(stopwords.map(lit): _*)
      filter(toks, t => !exists(sw, s => t.contains(s)))
    }

  /** Character n-grams ("shingles") of the normalized text — the MinHash /
    * Jaccard unit. Uses sequence+transform so it stays codegen'd.
    */
  def charShingles(c: Column, n: Int): Column = {
    val s = regexp_replace(normalized(c), " ", "_")
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(length(s) - n, lit(0))),
          i => substring(s, lit(1) + i, lit(n))),
        g => length(g) === n))
  }

  /** Token n-grams (e.g. 3-grams of words) as join-key strings. */
  def tokenNgrams(toks: Column, n: Int): Column =
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))),
        g => size(split(g, " ")) === n))
}
