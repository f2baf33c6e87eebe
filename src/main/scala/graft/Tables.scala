package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders over a driver fixture dir (`/root/testdata/sf*`).
  *
  * All operators take a DataFrame in, so these are the only place that knows
  * file layout. At cluster scale the same operators run over partitioned
  * warehouse tables — the loaders would swap for `spark.table(...)` without
  * touching any operator code.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** The events fixture has shipped in two layouts: TIMESTAMP(NANOS)
    * parquet (which Spark's vectorized reader rejects — read nanos as long
    * and truncate to micros, matching DuckDB's epoch_us truncation) and
    * native TIMESTAMP(MICROS) (read as-is). Adapt on the observed type so
    * both generations of the fixture load identically.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ =>
        // TIMESTAMP(MICROS) parquet arrives as TIMESTAMP_NTZ; downstream
        // operators use unix_micros/window which require LTZ. The session
        // timezone is pinned UTC, so the cast is a pure type relabel with
        // identical wall-clock values (and matches DuckDB's naive epoch_us).
        raw.withColumn("ts", raw("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
