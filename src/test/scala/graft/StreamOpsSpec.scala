package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Top-level so Spark can build an encoder without an outer-scope capture. */
case class StreamDoc(doc_id: Long, ts: Timestamp, text: String)
case class StreamClsDoc(doc_id: Long, ts: Timestamp, cls: String, text: String)
case class StreamVec(vec_id: Long, ts: Timestamp, embedding: Array[Float])

/** Streaming semantics under MemoryStream: windowed aggregation with
  * watermark-based late-data handling, and stateful sessionization.
  */
class StreamOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("assembly at ingest: watermarked dedup + quality gate + split compose on a stream") {
    import org.apache.spark.sql.functions._
    import graft.operators.{SamplingOps, TextAnalysisOps}
    import graft.functions.TextFunctions.{normalized, tokens}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val good = "the quick brown fox jumps over the lazy dog and it runs far"
    val deduped = StreamOps.dedupStream(input.toDF(), "text", "ts")
    val gated = deduped
      .select(col("doc_id"), col("text"),
        normalized(col("text")).as("norm"), tokens(col("text"), 1, 100).as("toks"))
      .filter(TextAnalysisOps.qualityScoreFrom(
        col("text"), col("norm"), col("toks")) >= 0.5)
    val q = SamplingOps.assignSplits(gated, "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1))
      .select("doc_id", "split")
      .writeStream.format("memory").queryName("stream_assembly").start()
    input.addData(
      StreamDoc(1, ts(9, 0), good),
      StreamDoc(2, ts(9, 5), good),            // exact duplicate: dropped
      StreamDoc(3, ts(9, 10), "x"),            // fails the quality gate
      StreamDoc(4, ts(9, 20), good + " again"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("stream_assembly")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet === Set(1L, 4L))
    // split assignment agrees with the batch operator on the same ids
    val batch = SamplingOps.assignSplits(
      Seq(1L, 4L).toDF("doc_id"), "doc_id", Seq("train" -> 0.9, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows === batch)
  }

  test("LM quality gate in-stream: stream-static model joins, batch parity") {
    import org.apache.spark.sql.functions._
    import graft.operators.LmOps
    implicit val sqlCtx = spark.sqlContext
    // model trained on fluent text; a garbled doc scores all-miss NLL
    val train = Seq(
      (1L, "x", "the cat sat on the mat and the cat slept"),
      (2L, "x", "the dog sat on the rug and the dog slept")
    ).toDF("doc_id", "lang", "text")
    val model = LmOps.bigramModel(train, "text", "lang")
    val fluent = "the cat sat on the rug"
    val garble = "zz qq ww rr tt yy uu"
    val input = MemoryStream[StreamDoc]
    val q = StreamOps.qualityGateStream(
        input.toDF().withColumn("lang", lit("x")),
        model, "text", "lang", "doc_id", "ts", maxNll = 2.0)
      .writeStream.format("memory").queryName("lm_gate_stream")
      .outputMode("append").start()
    try {
      input.addData(
        StreamDoc(10, ts(9, 0), fluent),
        StreamDoc(11, ts(9, 5), garble),
        StreamDoc(12, ts(9, 10), "single")) // < 2 tokens: never scored
      q.processAllAvailable()
      // advance the watermark past the 9:00 window so verdicts emit
      input.addData(StreamDoc(99, ts(12, 0), fluent))
      q.processAllAvailable()
      val streamed = spark.table("lm_gate_stream")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(streamed.keySet === Set(10L))
      // batch face: same model, same delta, same verdicts and nll values
      val delta = Seq((10L, "x", fluent), (11L, "x", garble),
        (12L, "x", "single")).toDF("doc_id", "lang", "text")
      val batch = LmOps.qualityGateBatch(delta, model, "text", "lang",
          "doc_id", maxNll = 2.0)
        .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
      assert(batch.map(_._1).toSet === Set(10L, 11L)) // 12 unscorable
      val passed = batch.filter(_._3 == 1)
      assert(passed.map(_._1).toSeq === Seq(10L))
      assert(passed.head._2 === streamed(10L))
    } finally q.stop()
  }

  test("gopher rule gate in-stream: stateless projection, batch parity") {
    import org.apache.spark.sql.functions._
    import graft.operators.CurationOps
    implicit val sqlCtx = spark.sqlContext
    val good = ("the with " + (1 to 58).map(i => f"word$i%02d").mkString(" "))
    val short = "the with tiny doc"
    val input = MemoryStream[StreamDoc]
    val q = StreamOps.gopherGateStream(input.toDF(), "text")
      .select("doc_id", "pass_all")
      .writeStream.format("memory").queryName("gopher_gate_stream")
      .outputMode("append").start()
    try {
      input.addData(StreamDoc(1, ts(9, 0), good), StreamDoc(2, ts(9, 1), short))
      q.processAllAvailable()
      val streamed = spark.table("gopher_gate_stream")
        .collect().map(_.getLong(0)).toSet
      assert(streamed === Set(1L))
      // batch parity: the same projection over the same delta
      val batch = CurationOps.gopherRules(
          Seq((1L, good), (2L, short)).toDF("doc_id", "text"), "text")
        .filter(col("pass_all") === 1)
        .collect().map(_.getLong(0)).toSet
      assert(batch === streamed)
    } finally q.stop()
  }

  test("DSIR gate in-stream: frozen importance model, batch parity") {
    import org.apache.spark.sql.functions._
    import graft.operators.SamplingOps
    implicit val sqlCtx = spark.sqlContext
    // model fit offline: target docs use one vocabulary, raw adds another
    val train = Seq(
      (1L, "en", "alpha beta gamma alpha beta"),
      (2L, "en", "beta gamma alpha gamma"),
      (3L, "xx", "delta epsilon zeta delta"),
      (4L, "xx", "epsilon zeta delta zeta"))
      .toDF("doc_id", "lang", "text")
    val inst = SamplingOps.dsirInstances(train, "text")
    val model = SamplingOps.dsirModel(inst, col("lang") === "en")
      .collect() // freeze: the stream joins a static local frame
    val frozen = spark.createDataFrame(
      spark.sparkContext.parallelize(model.toSeq),
      org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("lrat",
            org.apache.spark.sql.types.DoubleType, nullable = true))))
    // UN-normalized arrivals: mixed case, punctuation, doubled spaces —
    // the gate must normalize before hashing or these land in different
    // buckets than the (normalized) frozen model's
    val targetish = "Alpha,  BETA gamma... beta!"
    val rawish = "Delta  EPSILON zeta, epsilon?"
    val input = MemoryStream[StreamDoc]
    val q = StreamOps.dsirGateStream(input.toDF(), frozen, "text",
        "doc_id", "ts", minW = 0.0)
      .writeStream.format("memory").queryName("dsir_gate_stream")
      .outputMode("append").start()
    try {
      input.addData(StreamDoc(10, ts(9, 0), targetish),
        StreamDoc(11, ts(9, 5), rawish))
      q.processAllAvailable()
      input.addData(StreamDoc(99, ts(12, 0), targetish)) // advance watermark
      q.processAllAvailable()
      val streamed = spark.table("dsir_gate_stream")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(streamed.keySet === Set(10L))
      assert(streamed(10L) > 0.0)
      // batch face on the same delta: identical weights, identical verdict
      val dinst = SamplingOps.dsirInstances(
        Seq((10L, "?", targetish), (11L, "?", rawish))
          .toDF("doc_id", "lang", "text"), "text")
      val batch = dinst.join(broadcast(frozen), "b")
        .groupBy("doc_id")
        .agg(round(sum(col("lrat") * col("n")), 6).as("w"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(batch(10L) === streamed(10L))
      assert(batch(11L) < 0.0)
    } finally q.stop()
  }

  test("composed ingest gate in-stream: struct + index-dup + LM gates fold " +
    "through one stateful op, batch parity") {
    import org.apache.spark.sql.functions._
    import graft.operators.{DedupOps, LmOps}
    implicit val sqlCtx = spark.sqlContext
    // history: two long fluent docs — the frozen model AND the stored index
    val h1 = (1 to 60).map(i => s"tok$i").mkString(" ")
    val h2 = (1 to 60).map(i => s"tok${i * 2 % 61 + 1}").mkString(" ")
    val history = Seq((1L, "en", h1), (2L, "en", h2)).toDF("doc_id", "lang", "text")
    val model = LmOps.bigramModel(history, "text", "lang")
    val idxBuckets = DedupOps.minhashSignatures(history, "text")
      .select(posexplode(col("bands")).as(Seq("band", "band_hash")))
      .distinct().collect().map(r => (r.getInt(0), r.getLong(1)))
      .toSeq.toDF("band", "band_hash")
    // arrivals: A passes everything (fresh vocab scores through the
    // backoff floor, under the generous gate), B fails struct (short),
    // C is an exact dup of h1 (every band collides)
    val docA = (61 to 125).map(i => s"tok$i").mkString(" ")
    val arrivals = Seq(
      StreamClsDoc(10L, ts(9, 0), "en", docA),
      StreamClsDoc(11L, ts(9, 5), "en", "tiny doc"),
      StreamClsDoc(12L, ts(9, 10), "en", h1))
    val input = MemoryStream[StreamClsDoc]
    val q = StreamOps.ingestGateStream(input.toDF(), model, idxBuckets,
        "text", "cls", "doc_id", "ts", maxNll = 10.0)
      .writeStream.format("memory").queryName("ingest_gate_stream")
      .outputMode("append").start()
    try {
      input.addData(arrivals: _*)
      q.processAllAvailable()
      input.addData(StreamClsDoc(99L, ts(12, 0), "en", docA)) // advance wm
      q.processAllAvailable()
      // the scaladoc's claim is structural: all three gates fold through
      // ONE stateful operator (struct filter and both probes stateless)
      assert(q.lastProgress.stateOperators.length === 1)
      val streamed = spark.table("ingest_gate_stream")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      // batch face on the same arrivals: identical survivor set + nll
      val batchDf = arrivals.toDF()
        .select(col("doc_id"), col("cls"), col("text"))
      val verdicts = StreamOps.ingestGateBatch(batchDf, model, idxBuckets,
          "text", "cls", "doc_id", maxNll = 10.0)
        .collect().map(r => r.getLong(0) ->
          (r.getInt(2), r.getInt(3), r.getInt(5), r.getInt(6))).toMap
      // every gate fires on exactly its own arrival
      assert(verdicts(10L)._4 === 1) // A admitted
      assert(verdicts(11L)._1 === 0) // B fails structural
      assert(verdicts(12L)._1 === 1 && verdicts(12L)._2 === 1) // C: dup
      val batchPass = verdicts.filter(_._2._4 == 1).keySet
      assert(streamed.keySet === batchPass)
      // and the admitted doc's nll matches the batch face to the bit
      val batchNll = StreamOps.ingestGateBatch(batchDf, model, idxBuckets,
          "text", "cls", "doc_id", maxNll = 10.0)
        .filter(col("passed") === 1)
        .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
      streamed.foreach { case (id, nll) => assert(batchNll(id) === nll) }
    } finally q.stop()
  }

  test("FIVE-stage ingest gate in-stream: struct + decontam + dup + LM + " +
    "pii fold through one stateful op, batch parity") {
    import org.apache.spark.sql.functions._
    import graft.operators.{CurationOps, DedupOps, LmOps}
    implicit val sqlCtx = spark.sqlContext
    val h1 = (1 to 60).map(i => s"tok$i").mkString(" ")
    val h2 = (1 to 60).map(i => s"tok${i * 2 % 61 + 1}").mkString(" ")
    val history = Seq((1L, "en", h1), (2L, "en", h2)).toDF("doc_id", "lang", "text")
    val model = LmOps.bigramModel(history, "text", "lang")
    val idxBuckets = DedupOps.minhashSignatures(history, "text")
      .select(posexplode(col("bands")).as(Seq("band", "band_hash")))
      .distinct().collect().map(r => (r.getInt(0), r.getLong(1)))
      .toSeq.toDF("band", "band_hash")
    // frozen eval set: one 13-token phrase
    val evalPhrase = (200 to 212).map(i => s"ev$i").mkString(" ")
    val evalGrams = Seq(Tuple1(evalPhrase)).toDF("text")
      .select(explode(CurationOps.gramHashes(col("text"), 13)).as("gram"))
      .collect().map(r => Tuple1(r.getLong(0))).toSeq.toDF("gram")
    assert(evalGrams.count() == 1)
    // A admitted (carries an email -> n_pii = 1); B contaminated (embeds
    // the eval phrase mid-doc); C dup of h1; D fails struct
    val docA = (61 to 125).map(i => s"tok$i").mkString(" ") +
      " reach me at a.b@example.org thanks"
    val docB = (300 to 330).map(i => s"tok$i").mkString(" ") + " " +
      evalPhrase + " " + (400 to 430).map(i => s"tok$i").mkString(" ")
    val arrivals = Seq(
      StreamClsDoc(10L, ts(9, 0), "en", docA),
      StreamClsDoc(11L, ts(9, 5), "en", docB),
      StreamClsDoc(12L, ts(9, 10), "en", h1),
      StreamClsDoc(13L, ts(9, 15), "en", "tiny"))
    val input = MemoryStream[StreamClsDoc]
    val q = StreamOps.ingestGateFullStream(input.toDF(), model, idxBuckets,
        evalGrams, "text", "cls", "doc_id", "ts", maxNll = 10.0)
      .writeStream.format("memory").queryName("ingest_full_stream")
      .outputMode("append").start()
    try {
      input.addData(arrivals: _*)
      q.processAllAvailable()
      input.addData(StreamClsDoc(99L, ts(12, 0), "en",
        (61 to 125).map(i => s"tok$i").mkString(" ")))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.length === 1) // one stateful op
      val streamed = spark.table("ingest_full_stream")
        .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
      val batchDf = arrivals.toDF()
        .select(col("doc_id"), col("cls"), col("text"))
      val verdicts = StreamOps.ingestGateFullBatch(batchDf, model, idxBuckets,
          evalGrams, "text", "cls", "doc_id", maxNll = 10.0)
      val vm = verdicts.collect().map(r => r.getAs[Long]("doc_id") -> (
        r.getAs[Int]("pass_struct"), r.getAs[Int]("is_contaminated"),
        r.getAs[Int]("is_dup"), r.getAs[Int]("passed"),
        r.getAs[Int]("n_pii"))).toMap
      assert(vm(10L)._4 === 1 && vm(10L)._5 === 1) // A admitted, email counted
      assert(vm(11L)._2 === 1 && vm(11L)._4 === 0) // B contaminated
      assert(vm(12L)._3 === 1 && vm(12L)._4 === 0) // C dup
      assert(vm(13L)._1 === 0) // D struct fail
      // stream emits exactly the batch-admitted set, with matching nll+pii
      assert(streamed.keySet === vm.filter(_._2._4 == 1).keySet)
      val batchDetail = verdicts.filter(col("passed") === 1)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("nll"), r.getAs[Int]("n_pii"))).toMap
      streamed.foreach { case (id, (nll, npii)) =>
        assert(batchDetail(id)._1 === nll && batchDetail(id)._2 === npii)
      }
      // and the admitted text scrubs statelessly at the sink
      val scrubbed = CurationOps.scrubPii(
          batchDf.filter(col("doc_id") === 10L), "text")
        .select("scrubbed").collect()(0).getString(0)
      assert(scrubbed.contains("[EMAIL]") && !scrubbed.contains("@"))
    } finally q.stop()
  }

  test("admittedScrubbed: the sink-side admitted-text composition runs " +
    "IN-STREAM (stream-static join on gate survivors) and matches the " +
    "batch face's scrubbed column exactly") {
    import org.apache.spark.sql.functions._
    import graft.operators.{CurationOps, DedupOps, LmOps}
    implicit val sqlCtx = spark.sqlContext
    val h1 = (1 to 60).map(i => s"tok$i").mkString(" ")
    val history = Seq((1L, "en", h1)).toDF("doc_id", "lang", "text")
    val model = LmOps.bigramModel(history, "text", "lang")
    val idxBuckets = DedupOps.minhashSignatures(history, "text")
      .select(posexplode(col("bands")).as(Seq("band", "band_hash")))
      .distinct().collect().map(r => (r.getInt(0), r.getLong(1)))
      .toSeq.toDF("band", "band_hash")
    val evalGrams = Seq(Tuple1(0L)).toDF("gram").filter(col("gram") < 0)
    // A admitted with an email + URL; C is a dup (must NOT reach the sink)
    val docA = (61 to 125).map(i => s"tok$i").mkString(" ") +
      " reach me at a.b@example.org or https://ex.org/p thanks"
    val arrivals = Seq(
      StreamClsDoc(10L, ts(9, 0), "en", docA),
      StreamClsDoc(12L, ts(9, 10), "en", h1))
    val srcBatch = arrivals.toDF().select(col("doc_id"), col("cls"), col("text"))
    val input = MemoryStream[StreamClsDoc]
    val gated = StreamOps.ingestGateFullStream(input.toDF(), model,
      idxBuckets, evalGrams, "text", "cls", "doc_id", "ts", maxNll = 10.0)
    // the composed example from the gate's scaladoc: survivors joined
    // back to the (static, replayable) source and scrubbed statelessly
    val q = StreamOps.admittedScrubbed(gated, srcBatch, "text", "doc_id")
      .writeStream.format("memory").queryName("admitted_scrubbed")
      .outputMode("append").start()
    try {
      input.addData(arrivals: _*)
      q.processAllAvailable()
      input.addData(StreamClsDoc(99L, ts(12, 0), "en",
        (61 to 125).map(i => s"tok$i").mkString(" ")))
      q.processAllAvailable()
      val out = spark.table("admitted_scrubbed")
        .select("doc_id", "scrubbed").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // only the admitted doc reaches the sink, text fully redacted
      assert(out.keySet === Set(10L))
      assert(out(10L).contains("[EMAIL]") && out(10L).contains("[URL]") &&
        !out(10L).contains("@"))
      // bit parity with the batch face's own scrubbed column
      val batchScrubbed = StreamOps.ingestGateFullBatch(srcBatch, model,
          idxBuckets, evalGrams, "text", "cls", "doc_id", maxNll = 10.0)
        .filter(col("passed") === 1)
        .select("doc_id", "scrubbed").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(batchScrubbed === out)
    } finally q.stop()
  }

  test("ingestGateBatch verdicts are total: one row per arrival, passed " +
    "iff struct and not-dup and lm") {
    import org.apache.spark.sql.functions._
    import graft.operators.{DedupOps, LmOps}
    val h = (1 to 60).map(i => s"tok$i").mkString(" ")
    val history = Seq((1L, "en", h)).toDF("doc_id", "lang", "text")
    val model = LmOps.bigramModel(history, "text", "lang")
    val idx = DedupOps.minhashSignatures(history, "text")
      .select(posexplode(col("bands")).as(Seq("band", "band_hash"))).distinct()
    val arrivals = Seq(
      (10L, "en", (61 to 125).map(i => s"tok$i").mkString(" ")), // fresh
      (11L, "en", "tiny"), // struct fail
      (12L, "en", h), // dup
      (13L, "zz", (61 to 125).map(i => s"tok$i").mkString(" ")), // unknown lang
      (14L, "en", ""), (15L, "en", null.asInstanceOf[String])) // degenerate
      .toDF("doc_id", "lang", "text")
    val v = graft.streaming.StreamOps.ingestGateBatch(arrivals, model, idx,
        "text", "lang", "doc_id", maxNll = 10.0)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(5), r.getInt(6))).toMap
    assert(v.keySet === Set(10L, 11L, 12L, 13L, 14L, 15L)) // total
    v.values.foreach { case (st, dup, lm, passed) =>
      assert(passed === (if (st == 1 && dup == 0 && lm == 1) 1 else 0))
    }
    assert(v(10L)._4 === 1) // the one genuinely fresh fluent arrival
    assert(v(13L)._3 === 0) // unknown lang: unscorable, LM gate fails closed
    assert(v(14L)._1 === 0 && v(15L)._1 === 0)
  }

  test("percolation in-stream: frozen standing queries alert, batch parity") {
    import org.apache.spark.sql.functions._
    import graft.operators.RetrievalOps
    implicit val sqlCtx = spark.sqlContext
    // standing queries built from a tiny corpus: probe doc 0 = {zebra...}
    val corpus = Seq(
      (0L, "zebra quagga okapi"),
      (1L, "common words here"),
      (2L, "more common words around here"),
      (3L, "zebra appears once more")
    ).toDF("doc_id", "text")
    val standing = RetrievalOps.buildStanding(corpus, "doc_id", "text", _ < 1)
    val input = MemoryStream[StreamDoc]
    val q = StreamOps.percolateStream(
        input.toDF(), standing, "text", "doc_id", "ts", minScore = 1.0)
      .writeStream.format("memory").queryName("percolate_stream")
      .outputMode("append").start()
    try {
      input.addData(
        StreamDoc(10, ts(9, 0), "a zebra and an okapi walked far"),
        StreamDoc(11, ts(9, 5), "nothing relevant at all"))
      q.processAllAvailable()
      input.addData(StreamDoc(99, ts(12, 0), "watermark push"))
      q.processAllAvailable()
      val streamed = spark.table("percolate_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(streamed.keySet === Set((0L, 10L)), "only the zebra doc alerts")
      // batch face: same standing index, same delta, same score
      val delta = Seq((10L, "a zebra and an okapi walked far"),
        (11L, "nothing relevant at all")).toDF("doc_id", "text")
      val batch = RetrievalOps.percolateScores(delta, "doc_id", "text", standing)
        .filter(col("score") >= 1.0)
        .select(col("query_id"), col("doc_id"), round(col("score"), 6).as("score"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(batch === streamed)
    } finally q.stop()
  }

  test("ANN ingest in-stream: frozen-centroid assignment, batch parity, " +
    "re-delivery deduped") {
    import org.apache.spark.sql.functions._
    import graft.operators.{IndexMaintOps, SimilarityOps}
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, SparkSpec.FixtureDir)
    val corpus = SimilarityOps.unitCorpus(emb)
    val (_, cents) = SimilarityOps.ivfIndex(corpus, SimilarityOps.IvfLists)
    val centSeq = IndexMaintOps.collectCentroids(cents)
    assert(centSeq.length == SimilarityOps.IvfLists)
    // batch truth: the window-argmax assignment at the same centroids
    val batch = IndexMaintOps.assignLists(cents, corpus.filter($"vec_id" < 40))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val arrivals = emb.filter($"vec_id" < 40)
      .select($"vec_id", $"embedding").collect()
      .map(r => StreamVec(r.getLong(0), ts(9, (r.getLong(0) % 50).toInt),
        r.getSeq[Float](1).toArray))
    val input = MemoryStream[StreamVec]
    val q = StreamOps.ivfIngestStream(input.toDF(), centSeq,
        "vec_id", "embedding", "ts")
      .writeStream.format("memory").queryName("ivf_ingest_stream")
      .outputMode("append").start()
    try {
      input.addData(arrivals.toSeq)
      // at-least-once re-delivery of the first five vectors
      input.addData(arrivals.take(5).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("ivf_ingest_stream")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq
      assert(streamed.length == 40, "re-delivered vectors must dedup")
      assert(streamed.toMap === batch,
        "stateless fold assignment must be bit-equal to the batch argmax")
      // the batch twin of the same expression agrees too
      val twin = StreamOps.ivfIngestBatch(
        emb.filter($"vec_id" < 40), centSeq, "vec_id", "embedding")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(twin === batch)
    } finally q.stop()
  }

  test("PII scrub at ingest: the stateless redaction projection runs in-stream") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = graft.operators.CurationOps
      .scrubPii(input.toDF(), "text")
      .select("doc_id", "scrubbed", "n_email")
      .writeStream.format("memory").queryName("stream_scrub").start()
    input.addData(
      StreamDoc(1, ts(9, 0), "reach me at a.b@ex.com today"),
      StreamDoc(2, ts(9, 1), "nothing sensitive"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("stream_scrub").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(rows(1L)._1 == "reach me at [EMAIL] today" && rows(1L)._2 == 1)
    assert(rows(2L)._1 == "nothing sensitive" && rows(2L)._2 == 0)
  }

  private def ev(id: Long, user: Long, t: Timestamp, typ: String = "click",
                 v: Double = 1.0): Event =
    Event(id, user, t, typ, v, "{}")

  test("windowed counts aggregate per tumbling hour; late data beyond watermark dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamOps.windowedCountsStream(input.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    try {
      input.addData(ev(1, 1, ts(10, 5)), ev(2, 1, ts(10, 40)), ev(3, 2, ts(11, 10)))
      query.processAllAvailable()
      // watermark now 11:10 - 30min = 10:40 — this event is within it
      input.addData(ev(4, 2, ts(12, 0)))
      query.processAllAvailable()
      // watermark now 11:30 — an event at 10:00 is late and must be dropped
      input.addData(ev(5, 3, ts(10, 0)))
      query.processAllAvailable()
      val rows = spark.table("win_counts")
        .groupBy("window_start").sum("n_events")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(rows(ts(10, 0)) == 2L) // late event 5 NOT counted
      assert(rows(ts(11, 0)) == 1L)
      assert(rows(ts(12, 0)) == 1L)
    } finally query.stop()
  }

  test("stateful sessionize counts gap-separated sessions per user across batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamOps.sessionize(input.toDS(), gapMinutes = 60)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      // user 1: two events 10min apart (1 session); user 2: one event
      input.addData(ev(1, 1, ts(9, 0)), ev(2, 1, ts(9, 10)), ev(3, 2, ts(9, 30)))
      query.processAllAvailable()
      // batch 2: user 1 comes back 3h later -> second session
      input.addData(ev(4, 1, ts(12, 30)))
      query.processAllAvailable()
      val rows = spark.table("sessions")
        .groupBy("user_id").max("n_sessions", "n_events")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(rows(1L) == (2L, 3L))
      assert(rows(2L) == (1L, 1L))
    } finally query.stop()
  }

  test("the same windowedCounts transform runs in batch mode (unified semantics)") {
    val batch = Seq(ev(1, 1, ts(10, 5)), ev(2, 1, ts(10, 55)), ev(3, 2, ts(11, 5)))
      .toDF()
    val rows = StreamOps.windowedCounts(batch)
      .collect().map(r => (r.getTimestamp(0), r.getLong(2))).toMap
    assert(rows(ts(10, 0)) == 2L && rows(ts(11, 0)) == 1L)
  }

  test("streaming dedup drops in-watermark duplicates by content fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val query = StreamOps.dedupStream(input.toDF(), "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // normalization makes 1 and 2 the same fingerprint; 3 differs
      input.addData(
        StreamDoc(1, ts(9, 0), "Spark join plan"),
        StreamDoc(2, ts(9, 10), "spark   JOIN plan!"),
        StreamDoc(3, ts(9, 20), "something else"))
      query.processAllAvailable()
      // same fingerprint again within the watermark window -> still dropped
      input.addData(StreamDoc(4, ts(9, 40), "spark join plan"))
      query.processAllAvailable()
      val ids = spark.table("dedup_stream")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 3L))
    } finally query.stop()
  }

  test("incremental dedup probes the stored index in-stream (index+delta at ingest)") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val hist = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "a completely different historical document about spark shuffles"),
      (3L, "yet another corpus entry with its own distinctive shingle set")
    ).toDF("doc_id", "text")
    val index = graft.operators.DedupOps.minhashIndex(hist, "doc_id", "text")
    val idxBuckets = index
      .select(posexplode(col("bands")).as(Seq("band", "band_hash"))).distinct()
    val input = MemoryStream[StreamDoc]
    val query = StreamOps.indexDupStream(input.toDF(), idxBuckets,
        "doc_id", "text", "ts")
      .select("doc_id")
      .writeStream.format("memory").queryName("index_dup_stream")
      .outputMode("append").start()
    try {
      input.addData(
        // replay of indexed doc 1 -> flagged
        StreamDoc(10, ts(9, 0), "the quick brown fox jumps over the lazy dog near the river bank"),
        StreamDoc(11, ts(9, 5), "novel text that shares no shingles with anything stored before"))
      query.processAllAvailable()
      input.addData(
        // replay of indexed doc 2 in a later micro-batch -> still flagged
        StreamDoc(12, ts(9, 30), "a completely different historical document about spark shuffles"),
        StreamDoc(13, ts(9, 35), "further fresh material arriving later in the ingest stream here"))
      query.processAllAvailable()
      val flagged = spark.table("index_dup_stream")
        .collect().map(_.getLong(0)).toSet
      assert(flagged === Set(10L, 12L))
      // the batch face computes the same flags on the same delta
      val delta = Seq(
        (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (11L, "novel text that shares no shingles with anything stored before"),
        (12L, "a completely different historical document about spark shuffles"),
        (13L, "further fresh material arriving later in the ingest stream here")
      ).toDF("doc_id", "text")
      val batchFlags = StreamOps.indexDupBatch(delta, idxBuckets, "doc_id", "text")
        .collect().map(_.getLong(0)).toSet
      assert(batchFlags === flagged)
    } finally query.stop()
  }

  test("span flags in-stream: gram probe against a stored index, batch parity") {
    // the substring tier's ingest gate: a doc is flagged when ANY k-token
    // window already exists in the historical gram index — catches an
    // indexed boilerplate sentence pasted into otherwise-novel text, which
    // the document-level minhash index misses once the surrounding text
    // diverges far enough
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val boiler = "this content is provided as is without warranty of any kind whatsoever"
    val hist = Seq(
      (1L, boiler),
      (2L, "a completely different historical document about spark shuffles today")
    ).toDF("doc_id", "text")
    val idx = graft.operators.SpanDedupOps.spanGramIndex(hist, "text")
    val input = MemoryStream[StreamDoc]
    val query = StreamOps.spanFlagStream(input.toDF(), idx,
        "doc_id", "text", "ts")
      .select("doc_id")
      .writeStream.format("memory").queryName("span_flag_stream")
      .outputMode("append").start()
    try {
      input.addData(
        // indexed boilerplate embedded mid-doc -> flagged
        StreamDoc(10, ts(9, 0),
          "fresh reporting today but " + boiler + " plus novel analysis after"),
        // novel text, no shared 8-token window -> not flagged
        StreamDoc(11, ts(9, 5),
          "entirely new material that shares no long span with the archive"))
      query.processAllAvailable()
      input.addData(
        // exact replay of an indexed doc in a later micro-batch -> flagged
        StreamDoc(12, ts(9, 30), boiler),
        StreamDoc(13, ts(9, 35),
          "more fresh text arriving later in the stream with its own words"))
      query.processAllAvailable()
      val flagged = spark.table("span_flag_stream")
        .collect().map(_.getLong(0)).toSet
      assert(flagged === Set(10L, 12L))
      // the batch twin computes the same flag set on the same delta
      val delta = Seq(
        (10L, "fresh reporting today but " + boiler + " plus novel analysis after"),
        (11L, "entirely new material that shares no long span with the archive"),
        (12L, boiler),
        (13L, "more fresh text arriving later in the stream with its own words")
      ).toDF("doc_id", "text")
      val batchFlags = StreamOps.spanFlagBatch(delta, idx, "doc_id", "text")
        .collect().map(_.getLong(0)).toSet
      assert(batchFlags === flagged)
      // the hit-count face agrees and counts WINDOWS: the full replay's
      // every window hits; the embedded-boilerplate doc hits on the
      // boilerplate windows only
      val hits = graft.operators.SpanDedupOps
        .spanHitBatch(delta, idx, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(hits.keySet === Set(10L, 12L))
      assert(hits(12L)._1 == hits(12L)._2, "full replay: every window hits")
      assert(hits(10L)._2 < hits(10L)._1, "embedded boilerplate: partial hits")
    } finally query.stop()
  }

  test("index dedup stream: out-of-order arrivals across the watermark") {
    // Adversarial late data against indexDupStream. What the operator
    // guarantees (and this test pins): the index probe itself is STATELESS,
    // so arrival order never changes whether a doc is flagged; only the
    // per-doc_id output dedup is stateful, bounded by the watermark — a
    // re-delivery of the same doc_id within the watermark is suppressed,
    // one arriving after its state was evicted is re-emitted (at-least-once
    // flags under eviction: the documented stream/batch divergence — batch,
    // with full hindsight, emits each doc_id once).
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val replay1 = "the quick brown fox jumps over the lazy dog near the river bank"
    val replay2 = "a completely different historical document about spark shuffles"
    val novel = "novel text that shares no shingles with anything stored before"
    val hist = Seq((1L, replay1), (2L, replay2)).toDF("doc_id", "text")
    val idxBuckets = graft.operators.DedupOps.minhashIndex(hist, "doc_id", "text")
      .select(posexplode(col("bands")).as(Seq("band", "band_hash"))).distinct()
    val input = MemoryStream[StreamDoc]
    val query = StreamOps.indexDupStream(input.toDF(), idxBuckets,
        "doc_id", "text", "ts", delay = "30 minutes")
      .select("doc_id")
      .writeStream.format("memory").queryName("index_dup_late")
      .outputMode("append").start()
    try {
      input.addData(
        StreamDoc(20, ts(10, 0), replay1), // indexed replay -> flagged
        StreamDoc(21, ts(10, 40), novel))
      query.processAllAvailable() // watermark -> 10:40 - 30m = 10:10
      input.addData(
        // out of order (behind the max-seen ts) -> still flagged: the
        // index probe is order-independent
        StreamDoc(22, ts(10, 20), replay2),
        // re-delivery of doc 20 while its state is live -> suppressed
        StreamDoc(20, ts(10, 25), replay1))
      query.processAllAvailable()
      val afterB2 = spark.table("index_dup_late").collect().map(_.getLong(0))
      assert(afterB2.sorted.toSeq == Seq(20L, 22L),
        s"expected one flag per doc_id, got ${afterB2.toSeq}")
      // advance the watermark far past doc 20's eviction point
      // (10:00 + 30min): max ts 13:00 -> watermark 12:30. State cleanup
      // runs against the PREVIOUS trigger's watermark, so a second batch is
      // what actually evicts the key — engine timing, not semantics.
      input.addData(StreamDoc(24, ts(13, 0), novel + " indeed"))
      query.processAllAvailable()
      input.addData(StreamDoc(25, ts(13, 5), novel + " again"))
      query.processAllAvailable()
      // late re-delivery of doc 20 after the watermark passed its eviction
      // point: the contract is AT-LEAST-ONCE flags — the row is either
      // suppressed (state still held) or re-emitted (state evicted), never
      // lost and never more than once per delivery. Exact eviction timing
      // is engine-internal; downstream consumers must tolerate the dup.
      input.addData(StreamDoc(20, ts(12, 50), replay1))
      query.processAllAvailable()
      val finalRows = spark.table("index_dup_late").collect().map(_.getLong(0))
      val n20 = finalRows.count(_ == 20L)
      assert(n20 >= 1 && n20 <= 2,
        s"doc 20 flag lost or over-duplicated: ${finalRows.toSeq}")
      // distinct flags agree with the batch face over the full delta
      val delta = Seq((20L, replay1), (21L, novel), (22L, replay2),
        (24L, novel + " indeed"), (25L, novel + " again")).toDF("doc_id", "text")
      val batchFlags = StreamOps.indexDupBatch(delta, idxBuckets, "doc_id", "text")
        .collect().map(_.getLong(0)).toSet
      assert(batchFlags === finalRows.toSet)
    } finally query.stop()
  }

  test("windowed keyword counts track per-class word frequencies in-stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamClsDoc]
    val query = StreamOps.windowedKeywordsStream(input.toDF(), "text", "cls", "ts")
      .writeStream.format("memory").queryName("kw_stream")
      .outputMode("update").start()
    try {
      input.addData(
        StreamClsDoc(1, ts(10, 5), "ko", "spark join spark"),
        StreamClsDoc(2, ts(10, 20), "ko", "join filter"),
        StreamClsDoc(3, ts(10, 30), "en", "spark window"))
      query.processAllAvailable()
      val rows = spark.table("kw_stream")
        .collect()
        .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
      assert(rows(("ko", "spark")) === 2L)
      assert(rows(("ko", "join")) === 2L)
      assert(rows(("en", "spark")) === 1L)
    } finally query.stop()
  }

  test("batch dedup twin keeps one row per fingerprint") {
    val docs = Seq(
      StreamDoc(1, ts(9, 0), "Spark join plan"),
      StreamDoc(2, ts(9, 10), "spark   JOIN plan!"),
      StreamDoc(3, ts(9, 20), "something else")).toDF()
    assert(StreamOps.dedupBatch(docs, "text").count() === 2)
  }

  test("streaming funnel: stage machine matches the batch funnel across batches") {
    import org.apache.spark.sql.functions._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val stages = Seq("view", "click", "purchase")
    val q = StreamOps.funnelStream(input.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    val b1 = Seq(
      ev(1, 1, ts(9, 0), "view"), ev(2, 1, ts(9, 5), "click"),
      ev(3, 2, ts(9, 1), "click"),          // pre-view click: no progress
      ev(4, 3, ts(9, 2), "view"))
    val b2 = Seq(
      ev(5, 1, ts(9, 10), "purchase"),      // completes user 1
      ev(6, 2, ts(9, 11), "view"),          // user 2 starts properly
      ev(7, 3, ts(8, 0), "click"))          // LATE: before user 3's view — ignored
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val latest = spark.table("funnel_stream")
        .groupBy("user_id").agg(max("stage").as("stage"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(latest === Map(1L -> 3, 2L -> 1, 3L -> 1))
      // in-order users (1, 2) agree with the batch operator on ALL events;
      // user 3's late cross-batch click is the documented at-ingest
      // difference (batch replay would count it only if it were in order)
      val all = (b1 ++ b2).map(e => (e.user_id, e.ts, e.event_type))
        .toDF("user_id", "ts", "event_type")
      val reached = graft.operators.RelationalOps.funnelStages(
        all, "user_id", "ts", "event_type", stages)
      val batchStage = (1L to 3L).map { u =>
        u -> reached.count(_.filter(col("user_id") === u).count() > 0)
      }.toMap
      assert(batchStage(1L) === latest(1L) && batchStage(2L) === latest(2L))
    } finally q.stop()
  }

  test("stream-stream attribution joins conversions to in-horizon triggers") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = StreamOps.attributionStream(views.toDF(), buys.toDF(),
        horizon = "30 minutes", delay = "1 hour")
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    val v1 = Seq(
      ev(10, 1, ts(9, 0), "view"), // attributed: buy at 9:20
      ev(11, 2, ts(9, 5), "view"), // NOT: user 2's buy is 40 min later
      ev(12, 3, ts(9, 10), "view")) // NOT: no buy from user 3
    val b1 = Seq(
      ev(20, 1, ts(9, 20), "purchase", 5.0),
      ev(21, 2, ts(9, 45), "purchase", 7.0),
      ev(22, 4, ts(9, 30), "purchase", 9.0)) // no prior view
    try {
      views.addData(v1: _*)
      buys.addData(b1: _*)
      q.processAllAvailable()
      // a later view arrives cross-batch, still inside user 2's horizon
      views.addData(ev(13, 2, ts(9, 30), "view"))
      q.processAllAvailable()
      val got = spark.table("attr_stream")
        .select("user_id", "trigger_id", "conv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((1L, 10L, 20L), (2L, 13L, 21L)))
      // batch parity: the same join expression over the full static frames
      val batch = StreamOps.attributionStream(
        (v1 :+ ev(13, 2, ts(9, 30), "view")).toDF(), b1.toDF())
        .select("user_id", "trigger_id", "conv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch === got)
    } finally q.stop()
  }

  test("attribution join drops pairs that arrive behind both watermarks") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = StreamOps.attributionStream(views.toDF(), buys.toDF(),
        horizon = "30 minutes", delay = "1 hour")
      .writeStream.format("memory").queryName("attr_late")
      .outputMode("append").start()
    try {
      // advance both watermarks to ~14:00 (15:00 − 1h delay)
      views.addData(ev(30, 9, ts(15, 0), "view"))
      buys.addData(ev(40, 9, ts(15, 0), "purchase"))
      q.processAllAvailable()
      val before = spark.table("attr_late").count()
      // a matching pair far below the watermark: state for that region is
      // evicted, late rows drop — no new output
      views.addData(ev(31, 5, ts(9, 0), "view"))
      buys.addData(ev(41, 5, ts(9, 10), "purchase"))
      q.processAllAvailable()
      assert(spark.table("attr_late").count() === before)
    } finally q.stop()
  }

  test("streaming histogram buckets equal the batch sketch of everything ingested") {
    import org.apache.spark.sql.functions._
    import graft.operators.SketchOps
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = StreamOps.histogramStream(input.toDF(), "text", width = 8)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hist_stream").start()
    val b1 = Seq(
      StreamDoc(1, ts(9, 0), "spark join filter scan window"),
      StreamDoc(2, ts(9, 5), "hash merge sort"))
    val b2 = Seq(
      StreamDoc(3, ts(9, 10), "spark vector batch stream and a longer line"),
      StreamDoc(4, ts(9, 15), "x"))
    def batchOf(docs: Seq[StreamDoc]) = SketchOps.histogramSketch(
      docs.toDF().select(length(col("text")).as("len")), "len", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      val afterB1 = spark.table("hist_stream")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(afterB1 === batchOf(b1))
      input.addData(b2: _*)
      q.processAllAvailable()
      val afterB2 = spark.table("hist_stream")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(afterB2 === batchOf(b1 ++ b2))
      // state is the sketch itself: one row per occupied bucket
      assert(afterB2.size <= 8)
    } finally q.stop()
  }

  test("streaming HLL registers equal the batch sketch of everything ingested") {
    import org.apache.spark.sql.functions._
    import graft.operators.SketchOps
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = StreamOps.hllRegisterStream(input.toDF(), "text")
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream").start()
    val b1 = Seq(
      StreamDoc(1, ts(9, 0), "spark join filter scan window"),
      StreamDoc(2, ts(9, 5), "hash merge sort"))
    val b2 = Seq(
      StreamDoc(3, ts(9, 10), "spark vector batch stream"),
      StreamDoc(4, ts(9, 15), "join column value"))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      val afterB1 = spark.table("hll_stream")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch1 = SketchOps.hllRegisters(
        b1.toDF()
          .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
          .select(graft.functions.HashExpressions.rollingHash(col("w")).as("h")), "h")
      assert(afterB1 === batch1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)

      input.addData(b2: _*)
      q.processAllAvailable()
      val afterB2 = spark.table("hll_stream")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batchAll = SketchOps.hllRegisters(
        (b1 ++ b2).toDF()
          .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
          .select(graft.functions.HashExpressions.rollingHash(col("w")).as("h")), "h")
      assert(afterB2 === batchAll.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)
      // the state the stream carries is the register frame itself: <= m rows
      assert(afterB2.size <= 1024)
    } finally q.stop()
  }

  test("sessionize evicts idle users at watermark + gap; re-entry starts a new era") {
    // The r11 eviction contract: once the watermark passes a user's last
    // event by the session gap, the state entry is dropped (emitting its
    // closing totals), and a re-entering user counts a NEW session from
    // fresh counters — the same boundary the batch twin draws for an event
    // a full gap after its predecessor. Without eviction the re-entry
    // would emit the cumulative (2 sessions, 3 events).
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.sessionize(input.toDS(), gapMinutes = 60,
        delay = "30 minutes")
      .writeStream.format("memory").queryName("sessions_evict")
      .outputMode("update").start()
    try {
      // user 1: one session of two events
      input.addData(ev(1, 1, ts(9, 0)), ev(2, 1, ts(9, 10)))
      q.processAllAvailable() // watermark (after batch): 8:40
      // two watermark-advancing batches from another user: the timeout
      // fires against the PREVIOUS trigger's watermark, so the second
      // batch is what evicts user 1 (wm 13:30 > 9:10 + gap)
      input.addData(ev(3, 2, ts(14, 0)))
      q.processAllAvailable()
      input.addData(ev(4, 2, ts(14, 5)))
      q.processAllAvailable()
      // user 1 re-enters after eviction: fresh era, one session, one event
      input.addData(ev(5, 1, ts(15, 0)))
      q.processAllAvailable()
      val user1 = spark.table("sessions_evict")
        .filter(org.apache.spark.sql.functions.col("user_id") === 1L)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
      // b1 emit (1,2) + eviction closing emit (1,2) + re-entry (1,1);
      // the absence of (2,3) is the eviction proof
      assert(user1 == Seq((1L, 1L), (1L, 2L), (1L, 2L)),
        s"expected eviction + fresh re-entry, got $user1")
    } finally q.stop()
  }

  test("funnelStream evicts stale users; an evicted user restarts at stage 0") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val stages = Seq("view", "click", "purchase")
    // ttl of 1 hour so fixture-scale gaps cross it
    val q = StreamOps.funnelStream(input.toDS(), stages,
        delay = "30 minutes", ttlHours = 1)
      .writeStream.format("memory").queryName("funnel_evict")
      .outputMode("update").start()
    try {
      // user 1 reaches stage 2
      input.addData(ev(1, 1, ts(9, 0), "view"), ev(2, 1, ts(9, 5), "click"))
      q.processAllAvailable()
      // advance the watermark far past 9:05 + 1h (two batches: timeout
      // processing uses the previous trigger's watermark)
      input.addData(ev(3, 2, ts(14, 0), "view"))
      q.processAllAvailable()
      input.addData(ev(4, 2, ts(14, 5), "view"))
      q.processAllAvailable()
      // user 1 re-enters with a view: a LIVE stage-2 state would ignore it
      // (it awaits 'purchase'); a fresh post-eviction walk advances to 1
      input.addData(ev(5, 1, ts(15, 0), "view"))
      q.processAllAvailable()
      val user1 = spark.table("funnel_evict")
        .filter(org.apache.spark.sql.functions.col("user_id") === 1L)
        .collect().map(_.getInt(1)).toSeq.sorted
      // b1 emit (2) + eviction closing emit (2) + post-eviction restart (1)
      assert(user1 == Seq(1, 2, 2),
        s"expected eviction + stage-0 restart, got $user1")
    } finally q.stop()
  }

  test("attribution stream/batch parity against the oracle-checked query face") {
    // the rel_attribution query runs attributionStream's exact join
    // expression in batch over the events fixture; this pins that a
    // streamed replay of fixture-shaped data produces the same pairs the
    // query face computes on the same frames
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(
      ev(1, 1, ts(9, 0), "view"), ev(2, 2, ts(9, 5), "view"),
      ev(3, 1, ts(10, 0), "view"))
    val buys = Seq(
      ev(10, 1, ts(9, 20), "purchase", 5.0),
      ev(11, 2, ts(9, 50), "purchase", 7.0), // 45 min after the view: out
      ev(12, 1, ts(10, 10), "purchase", 9.0))
    val vstream = MemoryStream[Event]
    val bstream = MemoryStream[Event]
    val q = StreamOps.attributionStream(vstream.toDF(), bstream.toDF())
      .select("user_id", "trigger_id", "conv_id")
      .writeStream.format("memory").queryName("attr_parity")
      .outputMode("append").start()
    try {
      vstream.addData(views: _*)
      bstream.addData(buys: _*)
      q.processAllAvailable()
      val streamed = spark.table("attr_parity")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = StreamOps.attributionStream(views.toDF(), buys.toDF())
        .select("user_id", "trigger_id", "conv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed === Set((1L, 1L, 10L), (1L, 3L, 12L)))
    } finally q.stop()
  }
}
