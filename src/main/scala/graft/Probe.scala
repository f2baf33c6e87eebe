package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for interactive probing during development (not part of the
  * driver contract).
  */
object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
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
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    import graft.functions.TextFunctions._
    import graft.functions.HashExpressions._
    val docs = Tables.documents(spark, dir)
    val grams = docs
      .select(col("doc_id"),
        windowHashSet(rollingHashArray(tokens(col("text"))), 3).as("grams"))
      .filter(size(col("grams")) > 0)
      .persist()
    time("grams")(grams.count())
    val inverted = grams.select(col("doc_id"), explode(col("grams")).as("gram")).persist()
    time("inverted")(inverted.count())
    val rare = inverted.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 10 && col("df") >= 2).persist()
    time("rare")(rare.count())
    val postings = inverted.join(rare, "gram").persist()
    time("postings")(postings.count())
    val cands = postings.as("a")
      .join(postings.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct().persist()
    time("cands")(cands.count())
    time("full")(graft.operators.DedupOps.ngramDupPairs(spark, dir).count())
    spark.stop()
  }
}
