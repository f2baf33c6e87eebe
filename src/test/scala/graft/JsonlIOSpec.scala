package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.JsonlIO

/** JSONL source/sink: lossless roundtrip under an explicit schema (incl.
  * Korean text), malformed lines quarantined with the raw line preserved,
  * and the good side unaffected by bad neighbors.
  */
class JsonlIOSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("roundtrip preserves every row and column, including Korean text") {
    val docs = Tables.documents(spark, SparkSpec.FixtureDir)
    val dir = tmpDir("graft_jsonl_rt_").toString
    JsonlIO.writeJsonl(docs, dir)
    val (good, bad) = JsonlIO.readSplit(spark, dir, docs.schema)
    assert(bad.count() === 0)
    assert(good.count() === docs.count())
    // Column-complete equality both directions (null-safe via except).
    val back = good.select(docs.columns.map(col).toSeq: _*)
    assert(back.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(back).count() === 0)
  }

  test("gzip-compressed roundtrip is lossless too") {
    val docs = Tables.documents(spark, SparkSpec.FixtureDir)
    val dir = tmpDir("graft_jsonl_gz_").toString
    JsonlIO.writeJsonl(docs, dir, compression = Some("gzip"))
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".gz")))
    val (good, bad) = JsonlIO.readSplit(spark, dir, docs.schema)
    assert(bad.count() === 0)
    assert(good.exceptAll(docs.select(good.columns.map(col).toSeq: _*)).count() === 0)
    assert(good.count() === docs.count())
  }

  test("malformed lines are quarantined verbatim; good lines still parse") {
    val dir = tmpDir("graft_jsonl_bad_")
    val lines = Seq(
      """{"doc_id": 1, "text": "ok one", "lang": "en"}""",
      """{"doc_id": 2, "text": "truncated""", // unterminated string
      """not json at all""",
      """{"doc_id": 3, "text": "ok two", "lang": "ko"}""")
    Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (good, bad) = JsonlIO.readSplit(spark, dir.toString, docSchema)
    assert(good.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    val quarantined = bad.select("line").as[String].collect().toSet
    assert(quarantined === Set(lines(1), lines(2)))
  }

  test("a wrong-typed field quarantines the record rather than zeroing it") {
    val dir = tmpDir("graft_jsonl_typ_")
    Files.write(dir.resolve("part-0.jsonl"),
      """{"doc_id": "not-a-number", "text": "x", "lang": "en"}""".getBytes("UTF-8"))
    val (good, bad) = JsonlIO.readSplit(spark, dir.toString, docSchema)
    assert(good.count() === 0)
    assert(bad.count() === 1)
  }

  test("readJsonl refuses a schema that collides with the corrupt column") {
    val clash = docSchema.add(JsonlIO.Corrupt, StringType)
    intercept[IllegalArgumentException] {
      JsonlIO.readJsonl(spark, "/tmp/nowhere", clash)
    }
  }
}
