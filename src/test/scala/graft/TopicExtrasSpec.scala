package graft

import org.apache.spark.sql.functions._
import graft.operators.{TopicExtrasOps, TopicMetricsOps}

/** Topic reduction, interpretation, example scoring, and TF-IDF on
  * hand-checkable fixtures.
  */
class TopicExtrasSpec extends SparkSuite {
  import spark.implicits._

  test("reduceTopics merges the two nearest clusters and renumbers") {
    // clusters 0/1 nearly parallel (should merge), 2 orthogonal
    val assigned = Seq(
      (1L, 0, Array(1.0, 0.0)), (2L, 0, Array(1.0, 0.1)),
      (3L, 1, Array(0.9, 0.05)),
      (4L, 2, Array(0.0, 1.0)), (5L, 2, Array(0.1, 1.0))
    ).toDF("id", "cluster", "vector")
    val reduced = TopicExtrasOps.reduceTopics(assigned, target = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(reduced(1L) == reduced(2L) && reduced(2L) == reduced(3L))
    assert(reduced(4L) == reduced(5L))
    assert(reduced(1L) != reduced(4L))
    assert(Set(reduced(1L), reduced(4L)) == Set(0, 1)) // renumbered 0..K'-1
  }

  test("reduceTopics with target >= K is identity on grouping") {
    val assigned = Seq(
      (1L, 0, Array(1.0, 0.0)), (2L, 1, Array(0.0, 1.0))
    ).toDF("id", "cluster", "vector")
    val reduced = TopicExtrasOps.reduceTopics(assigned, target = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(reduced(1L) != reduced(2L))
  }

  test("interpretKeywords: matched categories in order, 'general' fallback") {
    val kw = Seq(
      ("t0", 1, "join"), ("t0", 2, "fast"),   // relational+performance
      ("t1", 1, "spark"),                      // infra
      ("t2", 1, "nothing"), ("t2", 2, "else") // general
    ).toDF("cls", "rank", "word")
    val out = TopicExtrasOps.interpretKeywords(kw)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out("t0") == ("relational+performance", 2))
    assert(out("t1") == ("infra", 1))
    assert(out("t2") == ("general", 0))
  }

  test("jaccardExamples ranks the doc overlapping the keywords highest") {
    val docs = Seq(
      (1L, "c", "join filter scan"), // all 3 keywords
      (2L, "c", "join other words"), // 1 of 3
      (3L, "c", "nothing related here")
    ).toDF("doc_id", "cls", "text")
    val kw = Seq(("c", 1, "join"), ("c", 2, "filter"), ("c", 3, "scan"))
      .toDF("cls", "rank", "word")
    val rows = TopicExtrasOps.jaccardExamples(docs, kw, "doc_id", "text", "cls", 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.find(_._1 == 1).get._2 == 1L)
    assert(rows.find(_._1 == 1).get._3 == 1.0)
    assert(rows.find(_._1 == 3).get._3 == 0.0)
  }

  test("tfidf: exclusive terms outrank ubiquitous terms") {
    val docs = Seq(
      (1L, "common rare1 common"), (2L, "common rare2"), (3L, "common rare3")
    ).toDF("doc_id", "text")
    val rows = TopicExtrasOps.tfidfTopTerms(docs, "doc_id", "text", 2)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getString(2))).toMap
    // doc 1: tf(common)=2 but df=3; rare1 tf=1 df=1
    // tfidf(common) = 2*(ln(4/4)+1) = 2.0; tfidf(rare1) = 1*(ln(4/2)+1) = 1.69
    assert(rows((1L, 1)) == "common") // tf=2 wins here
    assert(rows((2L, 1)) == "rare2")  // tf=1 each -> idf decides
    assert(rows((2L, 2)) == "common")
  }
}
