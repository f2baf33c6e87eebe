package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for interactive probing during development (not part of the
  * driver contract).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    import spark.implicits._
    import graft.operators._
    val docs = Tables.documents(spark, dir)
    val (vecs, vocab) = TopicModelOps.vectorize(docs, "text")
    vecs.persist()
    println(s"vocab size = ${vocab.length}, vecs = ${vecs.count()}")
    val model = new org.apache.spark.ml.clustering.LDA()
      .setK(2).setSeed(42L).setMaxIter(10).setFeaturesCol("features").fit(vecs)
    val topWords = model.describeTopics(10)
      .select(explode(col("termIndices")).as("termId"))
      .distinct().collect().map(_.getInt(0)).map(vocab(_))
    println("topWords = " + topWords.mkString(", "))
    val tw = topWords.zipWithIndex.map { case (w, i) => (w, i + 1) }.toSeq
      .toDF("word", "rank")
    tw.show(30, false)
    TopicMetricsOps.umassCoherence(docs, "text", tw).show(false)
    spark.stop()
  }
}
