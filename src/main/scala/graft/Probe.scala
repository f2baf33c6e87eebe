package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-inspection main: dumps the formatted physical plan of every
  * SparkEntry query (or the ones named as args after the fixture dir).
  * The review artifact for pushdown / broadcast / codegen checks:
  *
  *   MAIN=graft.Probe tools/run_verify.sh /root/testdata/sf0.01 > plans.txt
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
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // tools/run_verify.sh always passes an outDir second arg — only treat
    // args that actually name queries as a selection
    val selected = args.drop(1).filter(SparkEntry.queries.contains).toSeq
    val names =
      if (selected.nonEmpty) selected else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"===== $q =====")
      try println(SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(FormattedMode))
      catch { case e: Throwable => println(s"(failed to plan: ${e.getMessage})") }
    }
    spark.stop()
  }
}
