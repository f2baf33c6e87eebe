package graft

import org.apache.spark.sql.SparkSession

/** Dev timing main: run named SparkEntry queries (all if none named) with a
  * warmup pass and per-query medians, mirroring Bench's measurement protocol
  * but on an arbitrary subset — the tool for chasing one slow query without
  * paying the full bench sweep.
  *
  *   MAIN=graft.TimeQueries tools/run_verify.sh /root/testdata/sf0.1 topic_interpret
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val selected = args.drop(1).filter(SparkEntry.queries.contains).toSeq
    val names =
      if (selected.nonEmpty) selected else SparkEntry.queries.keys.toSeq.sorted
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try Caching.scoped {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      } finally Caching.releaseAll()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { q =>
      // the warmup pass IS the cold point for registry-backed queries
      // (first call pays the deterministic fit; later calls hit the
      // registry) — printed so cold-vs-warm is measurable per query
      val cold = run(q)
      val ts = (1 to runs).map(_ => run(q)).sorted
      val med = ts(ts.size / 2)
      println(f"[time] $q: cold $cold%.2f s, median $med%.2f s (runs ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
