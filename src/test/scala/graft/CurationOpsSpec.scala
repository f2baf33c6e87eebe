package graft

import org.apache.spark.sql.functions._

import graft.operators.CurationOps

/** Curation-tier invariants: planted eval leakage is found (and near-misses
  * are not), and PII redaction replaces every category while leaving clean
  * text untouched.
  */
class CurationOpsSpec extends SparkSuite {
  import spark.implicits._

  test("contaminated flags a planted 13-gram overlap and ignores partial overlap") {
    val evalDocs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november"))
      .toDF("doc_id", "text")
    val train = Seq(
      // contains the eval doc's full 13-token run inside other text
      (10L, "prefix words alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike suffix"),
      // shares only 4 leading tokens — below any 13-gram
      (11L, "alpha bravo charlie delta unrelated tail entirely different from the evaluation material here"),
      // too short to carry any 13-gram at all
      (12L, "short doc")).toDF("doc_id", "text")
    val hits = CurationOps.contaminated(train, evalDocs, "doc_id", "text")
      .as[Long].collect().sorted
    assert(hits.toSeq === Seq(10L))
    // the action form drops exactly the flagged row
    val clean = CurationOps.decontaminate(train, evalDocs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(clean.toSeq === Seq(11L, 12L))
  }

  test("scrubPii redacts every category, counts match, clean text unchanged") {
    val df = Seq(
      (1L, "mail a.b@ex.com and see http://x.y/z?q=1 call +82 10-1234-5678 done"),
      (2L, "no personal data in this row")).toDF("id", "text")
    val rows = CurationOps.scrubPii(df, "text").orderBy("id").collect()
    val s = rows(0).getAs[String]("scrubbed")
    assert(s.contains("[EMAIL]") && s.contains("[URL]") && s.contains("[PHONE]"))
    assert(!s.contains("@") && !s.contains("http"))
    assert(rows(0).getAs[Int]("n_email") === 1)
    assert(rows(0).getAs[Int]("n_url") === 1)
    assert(rows(0).getAs[Int]("n_phone") === 1)
    assert(rows(1).getAs[String]("scrubbed") === "no personal data in this row")
    assert(rows(1).getAs[Int]("n_email") + rows(1).getAs[Int]("n_url")
      + rows(1).getAs[Int]("n_phone") === 0)
  }

  test("decontam profile: rates in [0,1], train partition complete") {
    val rows = CurationOps.decontamProfile(spark, SparkSpec.FixtureDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("contam_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_train"))
    }
  }

  test("bloom-prefiltered contamination equals the broadcast-set face, even saturated") {
    val evalDocs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november"))
      .toDF("doc_id", "text")
    val train = Seq(
      (10L, "prefix words alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike suffix"),
      (11L, "alpha bravo charlie delta unrelated tail entirely different from the evaluation material here"),
      (12L, "short doc")).toDF("doc_id", "text")
    val exact = CurationOps.contaminated(train, evalDocs, "doc_id", "text")
      .as[Long].collect().toSet
    val bloomed = CurationOps.contaminatedBloom(train, evalDocs, "doc_id", "text")
      .as[Long].collect().toSet
    assert(bloomed === exact)
    // a 32-bit filter saturates into false positives; exact verification
    // still yields precisely the true hits
    val saturated = CurationOps.contaminatedBloom(train, evalDocs,
      "doc_id", "text", mBits = 32, k = 2).as[Long].collect().toSet
    assert(saturated === exact)
    // and the fixture-scale profiles agree row for row
    val a = CurationOps.decontamProfile(spark, SparkSpec.FixtureDir)
      .collect().map(_.toString).sorted
    val b = CurationOps.decontamBloomProfile(spark, SparkSpec.FixtureDir)
      .collect().map(_.toString).sorted
    assert(a === b)
  }

  test("gopherRules: each rule fires on exactly its own failure mode") {
    // 60 distinct 4-letter-ish words incl. two required stop words — the
    // all-pass baseline every other doc is one mutation away from
    val passWords = "the with" +: (1 to 58).map(i => f"word$i%02d")
    val passText = passWords.mkString(" ")
    val docs = Seq(
      (1L, passText), // passes everything
      (2L, "the with tiny doc"), // < 50 words
      (3L, ("the with " + (1 to 58).map(_ => "a b").mkString(" "))), // mean len < 3
      (4L, passText + " " + (1 to 20).map(_ => "#").mkString(" ")), // symbols
      (5L, ("the with " + (1 to 58).map(i => s"$i").mkString(" "))), // digits only
      (6L, (1 to 60).map(i => f"word$i%02d").mkString(" ")), // no stop words
      (7L, "the with " + (1 to 58).map(_ => "xx yy").mkString(" ")) // repeats
    ).toDF("doc_id", "text")
    val got = CurationOps.gopherRules(docs, "text")
      .select("doc_id", "pass_wordcount", "pass_meanlen", "pass_symbol",
        "pass_alpha", "pass_stop", "pass_repeat", "pass_all")
      .collect().map(r => r.getLong(0) ->
        (1 to 7).map(r.getInt)).toMap
    assert(got(1L) === Seq(1, 1, 1, 1, 1, 1, 1))
    assert(got(2L)(0) === 0 && got(2L)(6) === 0) // word count fails
    assert(got(3L)(1) === 0) // mean word length fails
    assert(got(4L)(2) === 0) // symbol ratio fails
    assert(got(5L)(3) === 0) // alpha fraction fails (58/60 digit words)
    assert(got(6L)(4) === 0) // stop-word rule fails
    assert(got(7L)(5) === 0) // duplicate-bigram rule fails
  }

  test("gopherRules: the symbol cap applies per family, as published") {
    // 100-word base; 8 hashes + 8 ellipses = each family at 0.08 ≤ 0.1,
    // though POOLED they'd be 0.16 — the pre-r14 combined rule wrongly
    // failed this doc; per-family caps (Rae et al. A1.1) pass it
    val base = "the with" +: (1 to 98).map(i => f"word$i%02d")
    val both = base.mkString(" ") +
      " " + (1 to 8).map(_ => "#").mkString(" ") +
      " " + (1 to 8).map(_ => "...").mkString(" ")
    val hashHeavy = base.mkString(" ") + " " + (1 to 12).map(_ => "#").mkString(" ")
    val ellHeavy = base.mkString(" ") + " " + (1 to 12).map(_ => "…").mkString(" ")
    val got = CurationOps.gopherRules(
        Seq((1L, both), (2L, hashHeavy), (3L, ellHeavy)).toDF("doc_id", "text"),
        "text")
      .select("doc_id", "pass_symbol")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) === 1) // each family under its own cap
    assert(got(2L) === 0) // hash family over cap
    assert(got(3L) === 0) // ellipsis family over cap
  }

  test("curationFunnel: stages chain, counts monotone, rates consistent") {
    val rows = CurationOps.curationFunnel(spark, SparkSpec.FixtureDir)
      .collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("1_gopher_struct", "2_ppl_head_middle", "3_neardup_keep_first"))
    rows.foreach { r =>
      val (nIn, nOut, dropped) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nOut <= nIn && dropped === nIn - nOut)
      assert(r.getDouble(4) ===
        math.rint((nIn - nOut).toDouble / nIn * 1e4) / 1e4)
    }
    // each stage's input is the previous stage's output
    assert(rows(0).getLong(2) === rows(1).getLong(1))
    assert(rows(1).getLong(2) === rows(2).getLong(1))
    // something survives the whole funnel on the fixture
    assert(rows(2).getLong(2) > 0)
  }

  test("curationFunnel: sampled tercile cuts (the 100 TB posture) agree " +
    "with the exact funnel") {
    val exact = CurationOps.curationFunnelAt(spark, SparkSpec.FixtureDir, 1.0)
      .collect().sortBy(_.getString(0)).map(r => (r.getLong(1), r.getLong(2)))
    val sampled = CurationOps.curationFunnelAt(spark, SparkSpec.FixtureDir, 0.4)
      .collect().sortBy(_.getString(0)).map(r => (r.getLong(1), r.getLong(2)))
    // stage 1 is threshold-independent; the sampled perplexity cuts may
    // move only boundary docs, so every stage's output stays within 20%
    // (or two docs) of the exact funnel's
    assert(sampled(0) === exact(0))
    exact.zip(sampled).foreach { case ((_, eo), (_, so)) =>
      assert(math.abs(so - eo) <= math.max(2L, (0.2 * eo).toLong),
        s"sampled stage output $so vs exact $eo")
    }
  }

  test("curationFunnelFull: five stages chain, tokens track docs, scrub " +
    "is a transform") {
    val rows = CurationOps.curationFunnelFull(spark, SparkSpec.FixtureDir)
      .collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq === Seq("1_gopher_struct",
      "2_decontam_13gram", "3_ppl_head_middle", "4_neardup_keep_best",
      "5_pii_scrub"))
    rows.foreach { r =>
      val (nIn, nOut, dropped) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nOut <= nIn && dropped === nIn - nOut)
      assert(r.getDouble(4) ===
        math.rint((nIn - nOut).toDouble / nIn * 1e4) / 1e4)
    }
    // stages chain on BOTH docs and tokens
    (0 until 4).foreach { i =>
      assert(rows(i).getLong(2) === rows(i + 1).getLong(1))
      assert(rows(i).getLong(6) === rows(i + 1).getLong(5))
    }
    // filter stages only shrink the token budget; the scrub stage keeps
    // every doc (transform, not filter)
    (0 until 4).foreach(i => assert(rows(i).getLong(6) <= rows(i).getLong(5)))
    assert(rows(4).getLong(1) === rows(4).getLong(2))
    assert(rows(4).getLong(2) > 0) // something survives the whole funnel
  }

  test("gateAgreementQuery: totals partition, flags bounded, scores in range") {
    val rows = CurationOps.gateAgreementQuery(spark, SparkSpec.FixtureDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, pass, q) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(pass >= 0 && pass <= n)
      assert(q >= 0.0 && q <= 1.0)
    }
    // the (lang, bucket) cells partition the LM-scored corpus: per-lang
    // totals equal the tercile face's
    val byLang = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    val buckets = graft.operators.LmOps.pplBucketed(spark, SparkSpec.FixtureDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.toMap === buckets)
  }

  test("gopherRules: mean word length is over the COUNTED words — an " +
    "out-of-band mega-run does not inflate the ratio") {
    import spark.implicits._
    val passWords = Seq("the", "with") ++ (1 to 58).map(i => f"word$i%02d")
    val mega = "z" * 150 // one >100-char run: outside the token band
    val docs = Seq(
      (1L, passWords.mkString(" ")),
      (2L, passWords.mkString(" ") + " " + mega)).toDF("doc_id", "text")
    val got = CurationOps.gopherRules(docs, "text")
      .select("doc_id", "pass_meanlen", "pass_all")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // through r15 doc 2 failed meanlen ((300+150)/60 > 10) though its 60
    // counted words average 5 chars; the banded-sum numerator passes both
    assert(got(1L) === ((1, 1)))
    assert(got(2L) === ((1, 1)))
  }

  test("gopherRules: zero-token docs fail every ratio rule, columns total") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = CurationOps.gopherRules(docs, "text")
      .select("pass_wordcount", "pass_meanlen", "pass_symbol", "pass_alpha",
        "pass_all").collect()
    assert(got.length === 2)
    assert(got.forall(r => (0 until 5).forall(i => r.getInt(i) === 0)))
  }
  test("scrubPii substring gates are bit-identical to the ungated regexes " +
    "(r17: '@'/'http' are NECESSARY literals, not heuristics)") {
    import org.apache.spark.sql.functions._
    // adversarial rows: gate fires but the regex must not; regex must fire;
    // nested matches; long digit mega-token (the quadratic case the gate
    // exists for); gate char inside an already-replaced span
    val texts = Seq(
      "plain text with no pii at all",
      "an at sign @ alone and http without a url shape httpx",
      "contact user1@mail.example and see https://ex.org/p?u=a@b.c",
      "tel +82 10-1234-5678 and 12-34 567-8901",
      "v00123456x7890123400123456x78901234 digits 99887766x55443322",
      "trailing at a@ and bare scheme https:// nothing"
    ).toDF("text")
    val gated = CurationOps.scrubPii(texts, "text")
      .select("text", "n_email", "n_url", "n_phone", "scrubbed")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    // the ungated reference: the raw fold the pre-r17 implementation ran
    val counted = CurationOps.PiiPatterns.foldLeft(texts) { case (d, (cat, pat, _)) =>
      d.withColumn(s"n_$cat", regexp_count(col("text"), lit(pat)))
    }
    val raw = CurationOps.PiiPatterns.foldLeft(col("text")) {
      case (c, (_, pat, token)) => regexp_replace(c, pat, token)
    }
    val ungated = counted.withColumn("scrubbed", raw)
      .select("text", "n_email", "n_url", "n_phone", "scrubbed")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(gated.toSeq === ungated.toSeq)
  }

}
