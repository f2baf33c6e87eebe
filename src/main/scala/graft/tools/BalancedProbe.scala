package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the balanced-IVF operating point each corpus flavor records —
  * base fixtures vs their realistic twins — plus the per-probe recall
  * rows. The committed DEPLOY evidence for `sim_ivf_balanced_real`: the
  * twin's planted dup family concentrates vector mass, so the fair-share
  * splitter should record a DIFFERENT post-split list count than the base
  * corpus (the data-dependence that forced `balancedCfgByNs` to be
  * namespace-keyed, VERDICT r17 #2).
  *
  *   MAIN=graft.tools.BalancedProbe tools/run_verify.sh /root/testdata/sf0.01
  */
object BalancedProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft._
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    dirs.foreach { dir =>
      def rows(df: org.apache.spark.sql.DataFrame): String =
        df.collect().sortBy(_.getLong(0)).map { r =>
          s"q${r.getLong(0)}:${r.getDouble(3)}"
        }.mkString(" ")
      val t0 = System.nanoTime()
      val baseRows = Caching.scoped {
        rows(operators.SimilarityOps.ivfRecallBalanced(spark, dir))
      }
      Caching.releaseAll()
      val tBase = (System.nanoTime() - t0) / 1e9
      val baseCfg = operators.SimilarityOps.balancedCfg("")
      val t1 = System.nanoTime()
      val twinRows = Artifacts.namespaced("real") {
        Caching.scoped {
          rows(operators.SimilarityOps.ivfRecallBalanced(
            spark, RealisticCorpus.ensure(spark, dir)))
        }
      }
      Caching.releaseAll()
      val tTwin = (System.nanoTime() - t1) / 1e9
      println(f"[balanced] $dir base cfg=$baseCfg ($tBase%.1f s): $baseRows")
      println(f"[balanced] $dir twin cfg=${operators.SimilarityOps.balancedCfg("real/")} " +
        f"($tTwin%.1f s): $twinRows")
      println(s"[balanced] $dir base cfg after twin ran: " +
        s"${operators.SimilarityOps.balancedCfg("")}")
    }
    spark.stop()
  }
}
