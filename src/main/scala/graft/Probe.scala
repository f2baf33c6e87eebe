package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for interactive probing during development (not part of the
  * driver contract).
  */
object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(s"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions._
    import graft.operators._
    val docs = Tables.documents(spark, dir)
    time("shingle count")(
      docs.select(sum(size(graft.functions.TextFunctions.charShingles(col("text"), 5)))).first())
    time("sig count")(DedupOps.minhashSignatures(docs, "text").count())
    time("minhash pairs")(DedupOps.minhashDupPairs(spark, dir).count())
    time("simhash pairs")(DedupOps.simhashDupPairs(spark, dir).count())
    time("ngram pairs")(DedupOps.ngramDupPairs(spark, dir).count())
    time("embed pairs")(DedupOps.embeddingDups(spark, dir).count())
    DedupOps.minhashDupPairs(spark, dir).show(5, false)
    DedupOps.simhashDupPairs(spark, dir).show(5, false)
    DedupOps.ngramDupPairs(spark, dir).show(5, false)
    DedupOps.embeddingDups(spark, dir).show(5, false)
    spark.stop()
  }
}
