package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.pipeline.Stopwords

/** StopwordsManager parity (preprocessing.py:71-176): default-list creation
  * on first load, persisted add/remove, membership, DataFrame view, and the
  * distributed filter path over the managed set.
  */
class StopwordsSpec extends SparkSuite {
  import spark.implicits._

  private def tmpFile() =
    Files.createTempDirectory("graft-sw").resolve("stopwords.txt").toString

  test("first load creates the default file; reload reads it back") {
    val path = tmpFile()
    val sw = new Stopwords(path)
    assert(Files.exists(Paths.get(path)))
    assert(sw.contains("그리고") && sw.contains("데이터"))
    val reloaded = new Stopwords(path)
    assert(reloaded.all === sw.all)
  }

  test("add/remove persist sorted to the file") {
    val path = tmpFile()
    val sw = new Stopwords(path)
    sw.add(" 신조어 ")
    assert(sw.contains("신조어"))
    assert(Files.readString(Paths.get(path)).linesIterator.contains("신조어"))
    sw.remove("신조어")
    assert(!sw.contains("신조어"))
    assert(!Files.readString(Paths.get(path)).linesIterator.contains("신조어"))
    val lines = Files.readString(Paths.get(path)).linesIterator.toSeq
    assert(lines === lines.sorted)
  }

  test("managed set drives the distributed stopword filter") {
    val path = tmpFile()
    val sw = new Stopwords(path)
    val toks = Seq(Seq("데이터", "spark", "그리고", "join")).toDF("toks")
      .select(TextFunctions.removeStopwords(col("toks"), sw.all).as("kept"))
      .collect()(0).getSeq[String](0)
    assert(toks === Seq("spark", "join"))
  }

  test("DataFrame view is one sorted word column") {
    val sw = new Stopwords(tmpFile())
    val df = sw.toDF(spark)
    assert(df.columns.toSeq === Seq("word"))
    assert(df.count() === sw.all.size)
  }
}
