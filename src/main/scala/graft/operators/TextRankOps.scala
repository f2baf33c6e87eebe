package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over the
  * adjacent-token co-occurrence graph. Corpus-scale work — the bigram
  * count — is the one distributed scan; the graph itself is
  * VOCABULARY-bounded (min-count-filtered distinct pairs), so the power
  * iteration runs driver-local over the collected edge list — the same
  * resist-over-distributing-K-bounded-work call as the hybrid BPE trainer
  * (SURVEY.md §7.4 risk 5). At 100 TB the collect moves a filtered
  * bigram dictionary, never corpus rows.
  *
  * Cross-engine determinism: every constant the oracle needs (damping,
  * 1−damping) is computed HERE once and interpolated into the SQL as a
  * round-trip-exact double literal; per-node contribution sums fold in
  * neighbor-ascending order on both engines (foldLeft here,
  * `list(... ORDER BY dst)` + list_reduce in the unrolled-CTE oracle), so
  * ten iterations stay bit-identical with no intermediate rounding.
  */
object TextRankOps {

  val TrDamping = 0.85
  val TrBase: Double = 1.0 - TrDamping
  val TrIters = 10
  val TrMinCount = 5
  val TrTopK = 20

  /** Distinct symmetric co-occurrence edges: directed adjacent pairs at
    * count ≥ minCount (self-loops dropped), symmetrized + deduped.
    */
  def cooccurrenceEdges(docs: DataFrame, textCol: String,
                        minCount: Int): DataFrame = {
    val bi = docs.select(tokens(col(textCol)).as("toks"))
      .select(explode(TextAnalysisOps.tokenBigrams(col("toks"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .withColumn("w1", element_at(split(col("bigram"), " "), 1))
      .withColumn("w2", element_at(split(col("bigram"), " "), 2))
      .filter(col("w1") =!= col("w2"))
    bi.select(col("w1").as("src"), col("w2").as("dst"))
      .union(bi.select(col("w2").as("src"), col("w1").as("dst")))
      .distinct()
  }

  /** Driver-local power iteration over a collected edge list. Returns the
    * full (word, rank) table after `iters` rounds. Neighbor sums fold in
    * dst-ascending order (JVM UTF-16 order ≡ DuckDB binary collation for
    * the [a-z0-9가-힣] token alphabet — both are codepoint order in the
    * BMP).
    */
  private[graft] def pageRank(edges: Array[(String, String)],
                              iters: Int): Map[String, Double] = {
    val adj: Map[String, Array[String]] = edges.groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._2).sorted }
    val deg: Map[String, Int] = adj.map { case (s, ns) => s -> ns.length }
    val n = adj.size
    var r: Map[String, Double] = adj.keysIterator.map(_ -> 1.0 / n).toMap
    var i = 0
    while (i < iters) {
      r = adj.map { case (w, ns) =>
        w -> (TrBase / n + TrDamping *
          ns.foldLeft(0.0)((acc, v) => acc + r(v) / deg(v)))
      }
      i += 1
    }
    r
  }

  /** Query: top-20 TextRank keywords over the documents fixture. */
  def textRankQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = cooccurrenceEdges(Tables.documents(spark, dir), "text",
      TrMinCount).as[(String, String)].collect()
    val ranked = pageRank(edges, TrIters).toSeq
      .sortBy { case (w, s) => (-s, w) }
      .take(TrTopK)
    ranked.zipWithIndex
      .map { case ((w, s), i) => (i + 1, w, s) }
      .toDF("pos", "word", "score_raw")
      // Spark's own round (HALF_UP) so both engines round identically
      .select(col("pos"), col("word"), round(col("score_raw"), 6).as("score"))
  }
}
