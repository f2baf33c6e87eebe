package graft

import org.apache.spark.sql.functions._

import graft.operators.ClassifierOps

/** Multinomial NB: separable classes classify correctly, evidence from
  * shared words follows the heavier class, OOV-only docs fall back to the
  * argmax-prior verdict so the output partitions the input.
  */
class ClassifierOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val train = Seq(
    (1L, "a", "xx yy xx"), (2L, "a", "xx yy"),
    (3L, "b", "zz ww zz"), (4L, "b", "zz ww")
  ).toDF("doc_id", "lang", "text")
  private lazy val model = ClassifierOps.nbTrain(train, "text", "lang")

  test("self-classification is perfect on separable vocabulary") {
    val (prior, lik) = model
    val got = ClassifierOps.nbClassify(prior, lik, train, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b"))
  }

  test("mixed evidence follows the majority class; OOV-only and empty " +
      "docs get the prior-only fallback") {
    val (prior, lik) = model
    val probe = Seq((10L, "xx xx zz"), (11L, "zz zz yy"), (12L, "qq rr"),
        (13L, ""))
      .toDF("doc_id", "text")
    val rows = ClassifierOps.nbClassify(prior, lik, probe, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val got = rows.map(r => r._1 -> r._2).toMap
    // the output partitions the input: all four docs verdicted exactly once
    assert(rows.map(_._1).sorted === Array(10L, 11L, 12L, 13L))
    // tied priors (2 docs each) break to the smaller class; score is the
    // rounded log-prior ln(1/2)
    assert(got === Map(10L -> "a", 11L -> "b", 12L -> "a", 13L -> "a"))
    rows.filter(r => r._1 >= 12L).foreach { r =>
      assert(math.abs(r._3 - math.rint(1e6 * math.log(0.5)) / 1e6) < 1e-12)
    }
  }

  test("likelihood grid is complete: every (word, class) cell has mass") {
    val (_, lik) = model
    // 4 distinct words x 2 classes, no nulls, all log-probs negative
    assert(lik.count() === 8)
    assert(lik.filter(col("ll").isNull || col("ll") >= 0).count() === 0)
    // unseen cell (zz, a) carries exactly the backoff alpha/(tot + alpha*V):
    // class a total 5, V=4 -> ln(0.5/7)
    val unseen = lik.filter(col("w") === "zz" && col("clazz") === "a")
      .collect()(0).getDouble(2)
    assert(math.abs(unseen - math.log(0.5 / 7.0)) < 1e-12)
  }

  test("metrics face is consistent with the confusion matrix") {
    val dir = SparkSpec.FixtureDir
    val conf = ClassifierOps.nbLangConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val met = ClassifierOps.nbLangMetrics(spark, dir).collect()
    met.foreach { r =>
      val (lang, nAct, nPred, tp) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nAct === conf.filter(_._1 == lang).map(_._3).sum)
      assert(nPred === conf.filter(_._2 == lang).map(_._3).sum)
      assert(tp === conf.filter(c => c._1 == lang && c._2 == lang)
        .map(_._3).sum)
      assert(tp <= math.min(nAct, nPred))
      // precision/recall/f1 match their integer-ratio definitions
      if (nPred > 0)
        assert(math.abs(r.getDouble(4) -
          math.rint(1e4 * tp.toDouble / nPred) / 1e4) < 1e-12)
      if (nAct > 0)
        assert(math.abs(r.getDouble(5) -
          math.rint(1e4 * tp.toDouble / nAct) / 1e4) < 1e-12)
      if (nAct + nPred > 0)
        assert(math.abs(r.getDouble(6) -
          math.rint(1e4 * 2.0 * tp / (nAct + nPred)) / 1e4) < 1e-12)
    }
  }

  test("fixture confusion matrix: every doc classified exactly once") {
    val m = ClassifierOps.nbLangConfusion(spark, SparkSpec.FixtureDir)
    val total = m.agg(sum("n_docs")).collect()(0).getLong(0)
    val docs = Tables.documents(spark, SparkSpec.FixtureDir)
    // every fixture doc has at least one in-vocabulary token (it was in
    // training), so the matrix partitions the corpus
    assert(total === docs.count())
    // the diagonal is populated for the dominant language
    val diag = m.filter(col("lang") === col("pred_lang")).count()
    assert(diag > 0)
  }
}
