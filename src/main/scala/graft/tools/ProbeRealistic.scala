package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe (r15): minhash cluster shape of candidate realistic
  * transforms — used to size RealisticCorpus' unique block so the dedup
  * tier sees planted structure, not corpus-wide saturation.
  */
object ProbeRealistic {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)

    for (nUniq <- Seq(0, 64, 128, 256)) {
      val bkt = graft.operators.SamplingOps.hashBucket(col("doc_id"), 10000)
      val uniq = when(bkt % 100 === 37, lit(""))
        .otherwise(concat_ws("", transform(
          sequence(lit(0), lit(nUniq - 1)),
          i => concat(lit(" v"),
            ((col("doc_id") * 8191 + i * 524287) % 100000000).cast("string"),
            lit("x"),
            ((col("doc_id") * 31 + i * 17) % 100000000).cast("string")))))
      val t = docs.select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          if (nUniq == 0) lit("") else uniq).as("text"))
      graft.Caching.scoped {
        val labels = graft.operators.DedupOps
          .minhashClusters(t, "doc_id", "text")
        val prof = labels.groupBy("label").count()
          .agg(count(lit(1)).as("n_clusters"), max("count").as("max_size"),
            sum(when(col("count") > 1, col("count")).otherwise(0)).as("in_dups"))
          .collect()(0)
        val pairs = graft.operators.DedupOps
          .minhashPairs(t, "doc_id", "text", 0.0)
        val jstats = pairs.agg(count(lit(1)), round(avg("jaccard"), 3),
          round(expr("percentile(jaccard, 0.9)"), 3)).collect()(0)
        println(s"[probe] nUniq=$nUniq clusters=${prof.get(0)} " +
          s"maxSize=${prof.get(1)} inDups=${prof.get(2)} " +
          s"candPairs=${jstats.get(0)} avgJ=${jstats.get(1)} p90J=${jstats.get(2)}")
      }
      graft.Caching.releaseAll()
    }
    spark.stop()
  }
}
