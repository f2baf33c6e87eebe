package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.HashExpressions.{dotK, unitVector}
import graft.functions.VectorFunctions.{asDouble, jaccard}

/** The remaining reference topic-surface pieces (SURVEY.md §2.9):
  *   - M10 topic reduction: agglomerative merge of cluster centroids by
  *     cosine similarity until K ≤ target (BERTopic_Analysis.py:352-367) —
  *     K×K math happens on the driver BY DESIGN (K ≤ 50, SURVEY.md §7.4),
  *     the relabel is a broadcast join.
  *   - M13 topic interpretation: keyword→category rule match + template
  *     label (LDA_Analysis.py:471-507).
  *   - M12 example scoring: rank a topic's documents by a pluggable
  *     similarity strategy — the reference's 4-way fallback chain
  *     (BERTopic_Analysis.py:539-665): model probability → embedding cosine
  *     ((s+1)/2) → TF-IDF cosine → keyword Jaccard.
  *   - A9 TF-IDF: smooth-idf term weighting as a plain DataFrame program.
  */
object TopicExtrasOps {

  // ---------------------------------------------------------------- M10

  /** Merge cluster centroids until at most `target` remain. `assigned` needs
    * (id, cluster, vector double-array) columns. Returns (id, cluster) with
    * merged clusters renumbered 0..K'-1 in min-original-id order.
    */
  def reduceTopics(assigned: DataFrame, target: Int,
                   artifactName: Option[String] = None): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val centroids = assigned
      .groupBy(col("cluster"))
      .agg(collect_list(col("vector")).as("vs"))
      .select(col("cluster"), expr(
        "transform(sequence(0, size(vs[0]) - 1), " +
          "i -> aggregate(vs, 0D, (acc, v) -> acc + v[i]) / size(vs))").as("centroid"))
      .collect()
      .map(r => r.getInt(0) ->
        r.getSeq[Double](1).toArray)
      .toMap
    // driver-side agglomerative merge over the (tiny) K×K cosine matrix
    var groups = centroids.keys.map(c => c -> Set(c)).toMap
    var cents = centroids
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    while (groups.size > target) {
      val ids = cents.keys.toSeq.sorted
      val (bi, bj) = (for { i <- ids; j <- ids if i < j } yield (i, j))
        .maxBy { case (i, j) => cos(cents(i), cents(j)) }
      val (a, b) = (cents(bi), cents(bj))
      val wa = groups(bi).size.toDouble
      val wb = groups(bj).size.toDouble
      val merged = a.indices.map(i => (a(i) * wa + b(i) * wb) / (wa + wb)).toArray
      groups = (groups - bj) + (bi -> (groups(bi) ++ groups(bj)))
      cents = (cents - bj) + (bi -> merged)
    }
    val relabel = groups.toSeq.sortBy(_._2.min).zipWithIndex
      .flatMap { case ((_, members), idx) => members.map(_ -> idx) }
    // the driver-side merge is the "fit" here; its output map exports so
    // the oracle can verify the distributed relabel join + aggregation
    artifactName.foreach(n =>
      graft.Artifacts.save(n)(relabel.toDF("cluster", "new_cluster")))
    val mapDf = broadcast(relabel.toDF("cluster", "new_cluster"))
    assigned.join(mapDf, "cluster")
      .select(col("id"), col("new_cluster").as("cluster"))
  }

  /** Query: KMeans k=8 reduced to 4 merged topics — sizes per merged topic
    * (rows-only: trains KMeans).
    */
  def reducedTopicSizes(spark: SparkSession, dir: String): DataFrame = {
    val assigned = TopicModelOps.fittedClusters(spark, dir, k = 8)
      .select(col("vec_id").as("id"), col("cluster"),
        asDouble(col("embedding")).as("vector"))
    reduceTopics(assigned, target = 4, artifactName = Some("topic_reduce_map"))
      .groupBy("cluster").agg(count(lit(1)).as("n_docs"))
      .orderBy("cluster")
  }

  // ---------------------------------------------------------------- M13

  /** Interpretation rules: category → trigger words (ordered; the label
    * concatenates matched categories in this order).
    */
  val Categories: Seq[(String, Seq[String])] = Seq(
    "relational" -> Seq("join", "filter", "scan", "agg", "sort"),
    "performance" -> Seq("fast", "slow", "big", "small"),
    "infra" -> Seq("spark", "batch", "hash", "merge"))

  /** Label each class from its top keywords: matched categories joined with
    * '+', or 'general' when nothing triggers.
    */
  def interpretKeywords(keywords: DataFrame): DataFrame = {
    val kwSets = keywords.groupBy(col("cls"))
      .agg(collect_set(col("word")).as("words"))
    val matched = Categories.foldLeft(kwSets) { case (df, (cat, triggers)) =>
      df.withColumn(s"m_$cat",
        size(array_intersect(col("words"), array(triggers.map(lit): _*))) > 0)
    }
    val label = concat_ws("+",
      Categories.map { case (cat, _) => when(col(s"m_$cat"), lit(cat)) }: _*)
    matched
      .withColumn("label", when(length(label) > 0, label).otherwise(lit("general")))
      .withColumn("n_matched",
        Categories.map { case (cat, _) => col(s"m_$cat").cast("int") }
          .reduce(_ + _))
      .select(col("cls"), col("label"), col("n_matched"))
  }

  /** Query: interpretation of the per-lang c-TF-IDF keyword sets. */
  def interpretByLang(spark: SparkSession, dir: String): DataFrame =
    interpretKeywords(TopicMetricsOps.ctfidfByLang(spark, dir))

  // ---------------------------------------------------------------- M12

  /** Strategy (d): rank docs per class by Jaccard(doc tokens, class top
    * keywords) — deterministic, oracle-checkable. Text truncated to 200
    * chars like the reference's examples (LDA_Analysis.py:452).
    */
  def jaccardExamples(docs: DataFrame, keywords: DataFrame, idCol: String,
                      textCol: String, classCol: String, k: Int): DataFrame = {
    val kwSets = keywords.groupBy(col("cls"))
      .agg(collect_set(col("word")).as("kw"))
    val scored = docs
      .select(col(idCol).as("doc_id"), col(classCol).as("cls"),
        array_distinct(tokens(col(textCol))).as("set"),
        substring(col(textCol), 1, 200).as("example"))
      .join(broadcast(kwSets), "cls")
      .withColumn("score", jaccard(col("set"), col("kw")))
    val w = Window.partitionBy(col("cls"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("cls"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"), col("example"))
  }

  /** Query: top-3 example docs per lang by keyword Jaccard. */
  def examplesByLang(spark: SparkSession, dir: String): DataFrame =
    jaccardExamples(Tables.documents(spark, dir),
      TopicMetricsOps.ctfidfByLang(spark, dir), "doc_id", "text", "lang", 3)

  /** Strategy (b): rank docs per cluster by embedding cosine to the cluster
    * centroid, normalized to [0,1] via the reference's (s+1)/2
    * (BERTopic_Analysis.py:589). Rows-only (KMeans-derived clusters).
    */
  def centroidExamples(spark: SparkSession, dir: String): DataFrame = {
    // projection over the shared persisted k=8 assignment — no refit, and the
    // derived frame is cheap enough to evaluate twice (centroids + join)
    val assigned = TopicModelOps.fittedClusters(spark, dir, k = 8)
      .select(col("vec_id"), col("cluster"), unitVector(asDouble(col("embedding"))).as("nv"))
    val centroids = assigned.groupBy(col("cluster"))
      .agg(collect_list(col("nv")).as("vs"))
      .select(col("cluster"), expr(
        "transform(sequence(0, size(vs[0]) - 1), " +
          "i -> aggregate(vs, 0D, (acc, v) -> acc + v[i]) / size(vs))").as("centroid"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("score01").desc, col("vec_id"))
    assigned.join(broadcast(centroids), "cluster")
      .withColumn("score01",
        (dotK(col("nv"), unitVector(col("centroid"))) + 1.0) / 2.0)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("cluster"), col("rank"), col("vec_id"),
        round(col("score01"), 4).as("score01"))
      .orderBy("cluster", "rank")
  }

  /** Strategy (c): rank docs per class by cosine between the document's
    * TF vector and the class's c-TF-IDF score vector, joined sparsely on
    * the shared term dimension (no dense vectors materialize).
    */
  def tfidfCosineExamples(docs: DataFrame, classScores: DataFrame, idCol: String,
                          textCol: String, classCol: String, k: Int): DataFrame =
    tfidfCosineExamplesFromTf(graft.Caching.track(
      docTermFreq(docs, idCol, textCol, classCol)), classScores, k)

  /** Per-doc term frequencies WITHOUT a token-level shuffle: the tfMap
    * kernel pre-aggregates inside the row and explode yields final
    * (doc_id, cls, word, tf) — one row per distinct word per doc, no
    * groupBy (the old explode+groupBy shuffled every token occurrence).
    */
  def docTermFreq(docs: DataFrame, idCol: String, textCol: String,
                  classCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(classCol).as("cls"),
      explode(graft.functions.TextExpressions.tfMapK(tokens(col(textCol))))
        .as(Seq("word", "tf")))
      .withColumn("tf", col("tf").cast("double"))

  /** Same ranking from a pre-aggregated (doc_id, cls, word, tf) frame —
    * persisted by the caller; lets the class scores derive from the SAME
    * frame so the corpus tokenizes once.
    */
  def tfidfCosineExamplesFromTf(docTf: DataFrame, classScores: DataFrame,
                                k: Int): DataFrame = {
    val docNorm = docTf.groupBy("doc_id")
      .agg(sqrt(sum(col("tf") * col("tf"))).as("dn"))
    val clsNorm = classScores.groupBy("cls")
      .agg(sqrt(sum(col("score") * col("score"))).as("cn"))
    val dots = docTf
      .join(classScores.select(col("cls"), col("word"), col("score")),
        Seq("cls", "word"))
      .groupBy("doc_id", "cls")
      .agg(sum(col("tf") * col("score")).as("dot"))
    val w = Window.partitionBy(col("cls"))
      .orderBy(col("score01").desc, col("doc_id"))
    dots
      .join(docNorm, "doc_id")
      .join(clsNorm, "cls")
      .withColumn("score01", col("dot") / (col("dn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("cls"), col("rank"), col("doc_id"),
        round(col("score01"), 4).as("score01"))
  }

  /** Query: top-3 example docs per lang by TF-IDF-cosine to the class's
    * c-TF-IDF vector. ONE tokenize pass: the doc-level TF is persisted and
    * the class TF (its re-aggregation — exact: small integer-valued doubles)
    * feeds the c-TF-IDF scoring.
    */
  def tfidfExamplesByLang(spark: SparkSession, dir: String): DataFrame = {
    val docTf = graft.Caching.track(
      docTermFreq(Tables.documents(spark, dir), "doc_id", "text", "lang"))
    val scores = TopicMetricsOps.classTermScoresFromTf(
      docTf.groupBy("cls", "word").agg(sum(col("tf")).cast("long").as("tf")))
      .select(col("cls"), col("word"), col("score"))
    tfidfCosineExamplesFromTf(docTf, scores, 3)
  }

  // ---------------------------------------------------------------- A9

  /** Smooth TF-IDF as a DataFrame program: tfidf = tf · (ln((N+1)/(df+1))+1).
    * Top-k terms per document.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    // per-doc TF via the tfMap kernel: no token-level shuffle (see
    // docTermFreq)
    val tf = graft.Caching.track(docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.TextExpressions.tfMapK(tokens(col(textCol))))
          .as(Seq("word", "tf"))))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = tf.select(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("word"))
    tf.join(dfreq, "word")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("word"),
        round(col("tfidf"), 4).as("tfidf"))
  }

  /** Query: top-5 TF-IDF terms for the first 20 documents. */
  def tfidfQuery(spark: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(Tables.documents(spark, dir).filter(col("doc_id") < 20),
      "doc_id", "text", 5)
}
