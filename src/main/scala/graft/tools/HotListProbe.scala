package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Dense-tier skew probe (r15 ask 3): plants 15% of the embedding corpus
  * as ONE tight cluster (the dense twin of the heavycluster text mode) and
  * measures what a hot IVF list does to probe cost and recall — then the
  * same gauges on the balanced (split-oversized-lists) index. Probe-only
  * main; findings land in DEPLOY.md.
  */
object HotListProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val hotFrac = sys.env.getOrElse("SPARK_GRAFT_HOT_FRAC", "0.15").toDouble
    val nProbe = sys.env.getOrElse("SPARK_GRAFT_HOT_NPROBE",
      SimilarityOps.IvfProbe.toString).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = graft.Tables.embeddings(spark, dir)
    val hotBp = math.round(hotFrac * 10000).toInt
    val bkt = graft.operators.SamplingOps.hashBucket(col("vec_id"), 10000)
    val center = raw.orderBy("vec_id").limit(1).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val centerLit = array(center.map(v => lit(v)): _*)
    val hot = raw.select(col("vec_id"),
      when(bkt < hotBp,
        zip_with(centerLit, sequence(lit(0), lit(center.length - 1)),
          (c, j) => c + lit(0.02f) *
            (((col("vec_id") * 31 + j.cast("long") * 17) % 100).cast("float")
              - lit(50.0f)) / lit(50.0f)))
        .otherwise(col("embedding")).as("embedding"),
      col("label"))

    def gauge(tag: String, emb: DataFrame, balanced: Boolean): Unit =
      graft.Caching.scoped {
        val corpus = graft.Caching.track(SimilarityOps.unitCorpus(emb))
        val n = corpus.count()
        val t0 = System.nanoTime()
        val (indexed0, cents) =
          if (balanced)
            SimilarityOps.ivfIndexBalanced(corpus, SimilarityOps.IvfLists)
          else SimilarityOps.ivfIndex(corpus, SimilarityOps.IvfLists)
        val buildS = (System.nanoTime() - t0) / 1e9
        val indexed = graft.Caching.track(indexed0)
        val sizes = indexed.groupBy("list").agg(count(lit(1)).as("sz"))
        val szStats = sizes.agg(count(lit(1)), max("sz"),
          round(max("sz") * 100.0 / n, 1)).collect()(0)
        val queries = graft.Caching.track(corpus.filter(col("vec_id") < 50)
          .withColumn("is_hot",
            (graft.operators.SamplingOps.hashBucket(col("vec_id"), 10000)
              < hotBp).cast("int")))
        val brute = graft.Caching.track(
          SimilarityOps.bruteForceTopK(corpus, queries, 10)
            .select(col("query_id"), col("vec_id")))
        brute.count()
        val t1 = System.nanoTime()
        val ann = SimilarityOps.ivfProbe(indexed, cents, queries, k = 10,
          nProbe = nProbe)
        val rec = brute
          .join(ann.select(col("query_id"), col("vec_id"), lit(1).as("hit")),
            Seq("query_id", "vec_id"), "left")
          .join(queries.select(col("vec_id").as("query_id"), col("is_hot")),
            "query_id")
          .groupBy("is_hot")
          .agg((sum(coalesce(col("hit"), lit(0))) / count(lit(1))).as("recall"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val wall = (System.nanoTime() - t1) / 1e9
        val scan = SimilarityOps
          .probeAssignments(cents, queries, nProbe)
          .join(sizes, "list")
          .join(queries.select(col("vec_id").as("query_id"), col("is_hot")),
            "query_id")
          .groupBy("is_hot")
          .agg((sum(col("sz")) / (count(lit(1)) / nProbe) / n)
            .as("frac"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        println(f"[hotlist] nProbe=$nProbe $tag%-18s lists=${szStats.get(0)} " +
          f"maxList=${szStats.get(1)} (${szStats.get(2)}%% of corpus) " +
          f"build=${buildS}%.1f s probe=${wall}%.1f s " +
          f"recall hot=${rec.getOrElse(1, Double.NaN)}%.3f " +
          f"cold=${rec.getOrElse(0, Double.NaN)}%.3f " +
          f"scan_frac hot=${scan.getOrElse(1, Double.NaN)}%.3f " +
          f"cold=${scan.getOrElse(0, Double.NaN)}%.3f")
      }

    gauge("uniform", raw, balanced = false)
    gauge("hot15", hot, balanced = false)
    gauge("hot15+balanced", hot, balanced = true)
    gauge("uniform+balanced", raw, balanced = true)
    graft.Caching.releaseAll()
    spark.stop()
  }
}
