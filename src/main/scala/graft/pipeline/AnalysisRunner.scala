package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** EP2/EP3 parity: the reference's end-to-end analysis entry points
  * (`LDAAnalyzer.run_complete_analysis`, /root/reference/LDA_Analysis.py:679-728;
  * `BERTopicAnalyzer.run_full_analysis`, BERTopic_Analysis.py:873-926) as
  * library runners that compose the operator suite and leave ONE report
  * directory (ReportSink) — the workbook the reference writes, re-expressed
  * as named parquet sheets.
  *
  * Everything heavy is the operators' existing distributed plans; the runner
  * only sequences them and collects K-sized summaries.
  */
object AnalysisRunner {

  /** EP3 — LDA analysis over a document DataFrame: topics, dominant-topic
    * histogram, per-topic coherence (u_mass + c_npmi), diversity,
    * keyword-overlap matrix, interpretation, summary.
    */
  def runLdaAnalysis(spark: SparkSession, docs: DataFrame, textCol: String,
                     outDir: String, k: Int = 5, maxIter: Int = 20,
                     topN: Int = 10, format: String = "parquet"): Unit =
      graft.Caching.scoped {
    import spark.implicits._
    PreprocessPipeline.requireColumns(docs, Seq(textCol))
    val (vecs0, vocab) = TopicModelOps.vectorize(docs, textCol)
    val vecs = graft.Caching.track(vecs0)
    val model = new org.apache.spark.ml.clustering.LDA()
      .setK(k).setSeed(TopicModelOps.Seed).setMaxIter(maxIter)
      // alpha='auto' parity; eta stays fixed at 1/k — see TopicModelOps.fittedLda
      .setOptimizeDocConcentration(true)
      .setFeaturesCol("features").fit(vecs)
    val topics = graft.Caching.track(
      TopicModelOps.describeJoined(spark, model, vocab, topN))
    // (cls=topic, rank, word) shape reused by every keyword-family operator
    val kw = graft.Caching.track(topics.select(col("topic").cast("string").as("cls"),
      col("rank"), col("term").as("word")))

    // all K topics scored in ONE corpus scan per measure (the old driver
    // loop re-scanned the corpus 2·K times, once per topic per measure);
    // the corpus is tokenized once and feeds both measures' presence scans
    val topicWords = topics
      .select(col("topic").as("cls"), col("term").as("word"), col("rank"))
    val toks = graft.Caching.track(
      TopicMetricsOps.tokenizedDocs(docs, textCol))
    val perTopicCoherence = TopicMetricsOps.umassByClassOfTokens(toks, topicWords)
      .select(col("cls").as("topic"), col("umass"))
      .join(TopicMetricsOps.npmiByClassOfTokens(toks, topicWords)
        .select(col("cls").as("topic"), col("c_npmi")), "topic")
      .orderBy("topic")

    // F7 — the reference's "keyword1, keyword2, …" report strings with
    // 4-decimal weights (LDA_Analysis.py:482,523-524)
    val topicsFormatted = topics
      .groupBy(col("topic"))
      .agg(sort_array(collect_list(struct(col("rank"), col("term"), col("weight"))))
        .as("kw")) // sort by rank — collect_list order is not deterministic
      .select(col("topic"),
        array_join(transform(col("kw"), s => s.getField("term")), ", ")
          .as("keywords"),
        array_join(transform(col("kw"), s => format_number(s.getField("weight"), 4)), ", ")
          .as("weights"))
    ReportSink.write(outDir, Seq(
      "topics" -> topics,
      "topics_formatted" -> topicsFormatted,
      "dominant" ->
        model.transform(vecs)
          .withColumn("dist",
            org.apache.spark.ml.functions.vector_to_array(col("topicDistribution")))
          .withColumn("maxp", array_max(col("dist")))
          .withColumn("topic",
            (array_position(col("dist"), col("maxp")) - 1).cast("int"))
          .filter(col("maxp") > 0.3)
          .groupBy("topic").agg(count(lit(1)).as("n_docs")),
      "coherence" -> perTopicCoherence,
      "diversity" -> TopicMetricsOps.topicDiversity(kw),
      "overlap" -> TopicMetricsOps.keywordOverlapMatrix(kw),
      "interpretation" -> TopicExtrasOps.interpretKeywords(kw),
      "summary" -> docs.agg(
        count(lit(1)).as("n_docs"),
        lit(k).as("n_topics"),
        round(avg(length(col(textCol))), 2).as("avg_len"))), format)
  }

  /** EP2 — cluster (BERTopic-analog) analysis: embeddings → PCA → KMeans →
    * c-TF-IDF keywords → deduped keywords, diversity, similarity matrix,
    * examples, interpretation, summary.
    */
  def runClusterAnalysis(spark: SparkSession, docs: DataFrame,
                         embeddings: DataFrame, idCol: String, textCol: String,
                         outDir: String, k: Int = 8,
                         format: String = "parquet"): Unit = graft.Caching.scoped {
    PreprocessPipeline.requireColumns(docs, Seq(idCol, textCol))
    val clusters = TopicModelOps.clusterEmbeddingsWithNoise(embeddings, k)
      .select(col("vec_id").as(idCol), col("cluster"))
    val clustered = graft.Caching.track(docs.join(clusters, idCol))
    // noise docs (cluster −1) stay in the size report but are excluded from
    // every keyword-derived sheet, as the reference does
    // (BERTopic_Analysis.py:395,438-439,474-475,549-550,695-697)
    val denoised = clustered.filter(col("cluster") =!= -1)
    val kw = graft.Caching.track(
      TopicMetricsOps.ctfidfKeywords(denoised, "cluster", textCol, 10))
    ReportSink.write(outDir, Seq(
      "keywords" -> kw,
      "keywords_dedup" -> TopicMetricsOps.dedupKeywords(kw, 5,
        withScore = true),
      "sizes" -> clustered.groupBy("cluster").agg(count(lit(1)).as("n_docs")),
      "diversity" -> TopicMetricsOps.topicDiversity(kw),
      "similarity" -> TopicMetricsOps.classSimilarityMatrix(
        denoised, "cluster", textCol),
      "examples" -> TopicExtrasOps.jaccardExamples(
        denoised, kw, idCol, textCol, "cluster", 3),
      "interpretation" -> TopicExtrasOps.interpretKeywords(kw),
      "summary" -> clustered.agg(
        count(lit(1)).as("n_docs"), lit(k).as("n_clusters"))), format)
  }
}
