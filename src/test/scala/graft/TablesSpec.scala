package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events fixture has shipped in two physical layouts across driver
  * rounds — TIMESTAMP(NANOS) (which Spark reads as long under
  * `nanosAsLong`) and native TIMESTAMP(MICROS) (which Spark reads as
  * TIMESTAMP_NTZ). `Tables.events` must adapt on the observed type and
  * surface the SAME LTZ micros either way; round 7's fixture flip took six
  * queries offline because the loader assumed the nanos layout.
  */
class TablesSpec extends SparkSuite {
  private def writeAndLoad(writer: String => Unit): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("tables-spec").toFile
    dir.deleteOnExit()
    writer(s"$dir/events.parquet")
    Tables.events(spark, dir.toString)
  }

  // one instant, expressed in each layout's physical type
  private val micros = 1704067200123456L // 2024-01-01 00:00:00.123456 UTC

  test("events: legacy nanos-as-long layout truncates to LTZ micros") {
    import spark.implicits._
    val ts = writeAndLoad { path =>
      Seq((1L, micros * 1000L + 789L, 7L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(path)
    }
    assert(ts.schema("ts").dataType == TimestampType)
    assert(ts.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("events: native timestamp layout relabels NTZ as LTZ unchanged") {
    import spark.implicits._
    val ts = writeAndLoad { path =>
      Seq((1L, 7L, "click", 1.0, "{}"))
        .toDF("event_id", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(lit(micros)).cast(TimestampNTZType))
        .write.parquet(path)
    }
    assert(ts.schema("ts").dataType == TimestampType)
    assert(ts.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("events: the driver fixture itself loads with an LTZ ts column") {
    val ev = Tables.events(spark, SparkSpec.FixtureDir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.filter(col("ts").isNull).count() == 0)
  }
}
