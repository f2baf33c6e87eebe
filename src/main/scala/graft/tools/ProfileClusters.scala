package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for the propagation-loop family (r15 ask 2):
  * splits the simhash cluster face into its edge build and its propagation
  * loop and times them separately, printing per-run samples (Bench only
  * reports medians). Not part of the query surface.
  */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.DedupOps
    val docs = graft.Tables.documents(spark, sfDir)

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    (1 to 3).foreach { run =>
      println(s"--- run $run")
      graft.Caching.scoped {
        val fps = t("bandedFps materialize") {
          val f = DedupOps.bandedFps(docs, "doc_id", "text")
          f.count(); f
        }
        val edges = t("edges materialize") {
          val e = graft.Caching.track(
            DedupOps.simhashPairsOfFps(fps, 3, Int.MaxValue)
              .select(col("doc_a"), col("doc_b")))
          println(s"  edges = ${e.count()}")
          e
        }
        t("propagate") {
          val p = DedupOps.propagateEdgesTracked(edges, DedupOps.ClusterRounds)
          p.labels.write.format("noop").mode("overwrite").save()
          println(s"  rounds = ${p.roundsUsed} converged=${p.converged}")
        }
      }
      graft.Caching.releaseAll()
      System.gc()
    }
    spark.stop()
  }
}
