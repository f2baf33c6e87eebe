package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table (SURVEY.md §2.10 — the
  * reference lists "온라인 토픽 모델링: 실시간 데이터 스트림 처리" as future
  * work, /root/reference/BERTopic_guideline.md:175; the driver fixtures ship
  * an events stream table).
  *
  * Design: every aggregation is a plain `DataFrame => DataFrame` transform,
  * so the SAME code runs in batch (`spark.read` — see the `stream_hourly`
  * SparkEntry query, oracle-checked) and streaming (`spark.readStream` +
  * watermark). That unification is the Spark-native answer to "online"
  * processing: no second engine, no reimplemented semantics.
  */
object StreamOps {

  /** Events schema (ts pre-truncated to micros — see Tables.events). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window counts per event type. In streaming, pair with
    * `withLateData` so state is bounded by the watermark.
    */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Watermarked variant for unbounded sources: events later than `delay`
    * behind the max seen ts are dropped and window state is evicted.
    */
  def windowedCountsStream(events: DataFrame, windowDur: String = "1 hour",
                           delay: String = "30 minutes"): DataFrame =
    windowedCounts(events.withWatermark("ts", delay), windowDur)

  /** Stream-STREAM event-time join: attribute each conversion to the
    * trigger events that preceded it within `horizon` for the same user
    * (view→purchase attribution). Both sides carry watermarks and the join
    * condition bounds event time in BOTH directions, which is exactly what
    * Spark needs to EVICT join state: a buffered trigger row is droppable
    * once the conversion-side watermark passes `trigger.ts + horizon`, so
    * state is bounded by rate × horizon — never stream length. The same
    * join expression runs in batch (StreamOpsSpec pins stream/batch
    * parity); this is the two-unbounded-inputs shape the stream-static
    * index probes can't express.
    */
  def attributionStream(triggers: DataFrame, conversions: DataFrame,
                        horizon: String = "30 minutes",
                        delay: String = "1 hour"): DataFrame = {
    val t = triggers.select(col("user_id").as("trigger_user"),
        col("ts").as("trigger_ts"), col("event_id").as("trigger_id"))
      .withWatermark("trigger_ts", delay)
    val c = conversions.select(col("user_id"), col("ts").as("conv_ts"),
        col("event_id").as("conv_id"), col("value"))
      .withWatermark("conv_ts", delay)
    t.join(c,
        col("trigger_user") === col("user_id") &&
          col("conv_ts") >= col("trigger_ts") &&
          col("conv_ts") <= col("trigger_ts") + expr(s"interval $horizon"))
      .select(col("user_id"), col("trigger_id"), col("trigger_ts"),
        col("conv_id"), col("conv_ts"), col("value"))
  }

  /** Query: the attribution join's BATCH face over the events fixture —
    * view→purchase within 30 minutes per user, the exact join expression
    * `attributionStream` runs on two unbounded inputs (watermarks are
    * no-ops in batch), so the stream-stream operator sits under the same
    * DuckDB hash gate as every sibling streaming face. Timestamps cross
    * engines as epoch micros (the events fixture is micro-truncated), and
    * StreamOpsSpec pins stream/batch parity against this same shape.
    */
  def attributionQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    attributionStream(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"),
      horizon = "30 minutes", delay = "1 hour")
      .select(col("user_id"), col("trigger_id"), col("conv_id"),
        unix_micros(col("trigger_ts")).as("trigger_us"),
        unix_micros(col("conv_ts")).as("conv_us"),
        round(col("value"), 2).as("value"))
  }

  /** Windowed per-class keyword counts — the "online topic modeling" the
    * reference lists as future work (BERTopic_guideline.md:175), as its
    * tractable streaming core: tokenized keyword frequencies per (window,
    * class), over which a batch sink ranks top-k per window. Same transform
    * batch and stream; tokenization is the engine's codegen'd chain.
    */
  def windowedKeywordCounts(docs: DataFrame, textCol: String, clsCol: String,
                            tsCol: String,
                            windowDur: String = "1 hour"): DataFrame =
    docs
      .select(col(clsCol).as("cls"), col(tsCol).as("ts"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(window(col("ts"), windowDur), col("cls"), col("word"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("cls"), col("word"),
        col("n"))

  /** Watermarked streaming face: keyword-count state is evicted once the
    * window falls behind the watermark.
    */
  def windowedKeywordsStream(docs: DataFrame, textCol: String, clsCol: String,
                             tsCol: String, windowDur: String = "1 hour",
                             delay: String = "30 minutes"): DataFrame =
    windowedKeywordCounts(docs.withWatermark(tsCol, delay), textCol, clsCol,
      tsCol, windowDur)

  /** Epoch seconds of 2026-01-01 00:00:00 UTC — the synthetic ingest clock
    * `topKeywordsQuery` assigns the documents fixture (one doc per minute),
    * shared with its oracle SQL so both engines derive identical windows.
    */
  val DocClockEpoch: Long = 1767225600L

  /** Query: top-k keywords per (window, class) — the batch sink over
    * `windowedKeywordCounts`, i.e. the ranked face of the online-topic
    * core, under the oracle. The documents fixture carries no timestamp, so
    * the query assigns the deterministic ingest clock doc_id → minute
    * (DocClockEpoch + 60·doc_id): windows are real 1-hour tumbling windows
    * over a real timestamp column, reproduced exactly by the oracle's
    * date_trunc (session TZ is UTC; stream_hourly pins the alignment). The
    * per-(window, class) rank runs as a window-group-limit top-k — each
    * task keeps ≤ k rows per group before the shuffle, never a global sort.
    */
  def topKeywordsQuery(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .withColumn("ts", timestamp_seconds(lit(DocClockEpoch) + col("doc_id") * 60L))
    val counts = windowedKeywordCounts(docs, "text", "lang", "ts")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"), col("cls"))
      .orderBy(col("n").desc, col("word"))
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("cls"), col("rank"), col("word"), col("n"))
  }

  /** Content fingerprint for exact dedup: seed-7 rolling hash of the
    * normalized text (the oracle-checked fingerprint the dedup family
    * shares, TextAnalysisOps.fingerprintSample).
    */
  def withFingerprint(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("fp", graft.functions.HashExpressions.rollingHash(
      graft.functions.TextFunctions.normalized(col(textCol))))

  /** Exact-duplicate drop, batch face: keep one row per fingerprint. */
  def dedupBatch(docs: DataFrame, textCol: String): DataFrame =
    withFingerprint(docs, textCol).dropDuplicates("fp")

  /** Exact-duplicate drop, streaming face: dropDuplicatesWithinWatermark
    * keeps a fingerprint in state only while a duplicate could still arrive
    * (the watermark delay), so state size tracks the recent window — not the
    * full corpus — and the operator runs forever on an unbounded ingest
    * stream. The training-pipeline use: dedup-at-ingest before documents
    * ever land in the corpus.
    */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  delay: String = "1 hour"): DataFrame =
    withFingerprint(docs, textCol)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming face of the HyperLogLog distinct sketch: the SAME register
    * transform as the batch sketch (SketchOps.hllRegisters — tokenize,
    * hash, bucket, max-rank), run as a streaming aggregation. The state IS
    * the register frame, bounded at m rows FOREVER regardless of stream
    * length — the rare aggregation that needs no watermark to stay bounded
    * — and registers max-merge, so the streamed state always equals the
    * batch sketch of everything ingested so far (StreamOpsSpec pins the
    * parity). Read the cardinality at any time with SketchOps.hllEstimate
    * over the sink.
    */
  def hllRegisterStream(docs: DataFrame, textCol: String,
                        m: Int = 1024): DataFrame =
    graft.operators.SketchOps.hllRegisters(
      docs
        .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
        .select(graft.functions.HashExpressions.rollingHash(col("word")).as("h")),
      "h", m)

  /** Streaming face of the histogram quantile sketch: the same bucket
    * aggregation as the batch sketch (SketchOps.histogramSketch) over
    * document lengths, run as a streaming aggregation. Like the HLL face,
    * the state IS the sketch — one row per occupied width-sized bucket,
    * bounded by the value range rather than the stream length, so no
    * watermark is needed — and bucket counts SUM-merge, so the streamed
    * state always equals the batch sketch of everything ingested
    * (StreamOpsSpec pins the parity). Read quantiles at any time with
    * SketchOps.quantileEstimates over the sink: length-distribution
    * monitoring at ingest without a second corpus scan.
    */
  def histogramStream(docs: DataFrame, textCol: String,
                      width: Int = 64): DataFrame =
    graft.operators.SketchOps.histogramSketch(
      docs.select(length(col(textCol)).as("len")), "len", width)

  /** Perplexity gate at ingest, streaming face — the quality sibling of
    * `dedupStream`: each arriving document's bigrams are scored through a
    * stateless chain of stream-static joins against the persisted
    * vocabulary-bounded bigram model (LmOps.scoredBigramRows — the model is
    * exactly the broadcast side a stream wants), then ONE watermarked
    * per-(window, doc) aggregation folds them into the doc's mean NLL and
    * the gate keeps docs at nll ≤ maxNll. State is bounded by the
    * watermark horizon (open windows only), never the corpus; emission is
    * append-mode (a doc's verdict is final once its window closes).
    * Batch parity with LmOps.qualityGateBatch is spec-pinned.
    */
  def qualityGateStream(docs: DataFrame, model: graft.operators.LmOps.BigramLm,
                        textCol: String, langCol: String, idCol: String,
                        tsCol: String, maxNll: Double = graft.operators.LmOps.NllGateMax,
                        delay: String = "1 hour"): DataFrame =
    graft.operators.LmOps
      .scoredBigramRows(docs, model, textCol, langCol, Seq(idCol, tsCol))
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), "1 hour"), col(idCol), col("lang"))
      .agg(round(-sum(col("lp")) / count(lit(1)), 6).as("nll"))
      .filter(col("nll") <= maxNll)
      .select(col(idCol), col("lang"), col("nll"))

  /** Gopher rule gate at ingest, streaming face: the rule columns are a
    * PURE per-row projection (CurationOps.gopherRules — no aggregation, no
    * state, no watermark needed), so the stream plan is the batch plan:
    * one codegen'd map, append-mode by construction. The cheapest gate in
    * the ingest chain — a deployment runs it FIRST, before the LM gate's
    * model joins and the dedup tier's index probes ever see the row.
    * Batch parity is definitional (same projection) and spec-pinned.
    */
  def gopherGateStream(docs: DataFrame, textCol: String): DataFrame =
    graft.operators.CurationOps.gopherRules(docs, textCol)
      .filter(col("pass_all") === 1)

  /** DSIR gate at ingest, streaming face: arriving docs are scored against
    * a FROZEN importance model (SamplingOps.dsirModel — a DsirBuckets-row
    * broadcast, fit offline on the reference corpora) via one stateless
    * token-hash explode + stream-static join, then ONE watermarked
    * per-(window, doc) sum folds the per-occurrence log-ratios and the
    * gate keeps docs at w ≥ minW — "does this arrival look like the
    * target domain?" at ingest. Per-occurrence summing equals the batch
    * face's Σ lrat·n exactly (n collapses), so parity is algebraic and
    * spec-pinned; buckets absent from the frozen model contribute nothing
    * on both faces (inner join).
    */
  def dsirGateStream(docs: DataFrame, model: DataFrame, textCol: String,
                     idCol: String, tsCol: String, minW: Double = 0.0,
                     delay: String = "1 hour"): DataFrame =
    docs
      // normalized() before the hash kernel: tokenHashes assumes the house
      // normal form (single-space splits), and the frozen model's buckets
      // were built over normalized text (SamplingOps.dsirInstances) — raw
      // text would silently re-bucket arrivals. Spec-pinned.
      .select(col(idCol), col(tsCol),
        explode(graft.functions.HashExpressions.tokenHashesK(
          graft.functions.TextFunctions.normalized(col(textCol)))).as("h"))
      .withColumn("b",
        col("h") % graft.operators.SamplingOps.DsirBuckets)
      .withWatermark(tsCol, delay)
      .join(broadcast(model), "b")
      .groupBy(window(col(tsCol), "1 hour"), col(idCol))
      .agg(round(sum(col("lrat")), 6).as("w"))
      .filter(col("w") >= minW)
      .select(col(idCol), col("w"))

  /** Percolation at ingest (standing queries / alerting): each incoming
    * doc is tokenized statelessly and its terms broadcast-joined to the
    * FROZEN standing-query table (RetrievalOps.buildStanding — idf and
    * avgdl baked at index-build time, the corpus is never touched again);
    * ONE watermarked per-(window, query, doc) aggregation folds the term
    * contributions (order-pinned, same fold as the batch face) and every
    * (query, doc) pair at score ≥ minScore emits an alert. State is
    * bounded by open windows × matched pairs; emission is append-mode.
    * Batch parity with RetrievalOps.percolateScores is spec-pinned.
    */
  def percolateStream(docs: DataFrame,
                      standing: graft.operators.RetrievalOps.StandingQueries,
                      textCol: String, idCol: String, tsCol: String,
                      minScore: Double = graft.operators.RetrievalOps.PercolateMin,
                      delay: String = "1 hour"): DataFrame =
    graft.operators.RetrievalOps
      // watermark attaches to the SOURCE, before the standing join: a doc
      // with no matching term still advances event time (its rows die in
      // the inner join, which would otherwise starve the watermark)
      .percolateTermRows(docs.withWatermark(tsCol, delay), idCol, textCol,
        standing, Seq(tsCol))
      .groupBy(window(col(tsCol), "1 hour"), col("query_id"), col("doc_id"))
      .agg(graft.operators.RetrievalOps.percolateScoreAgg)
      .filter(col("score") >= minScore)
      .select(col("query_id"), col("doc_id"), round(col("score"), 6).as("score"))

  /** Exploded (doc, band, band_hash) rows of `docs` that collide with the
    * stored index's band buckets — the shared core of the incremental-dedup
    * faces. The semi join is stream-static capable: the stream side only
    * computes signatures per incoming row (stateless codegen'd kernels) and
    * probes the index; the historical corpus is never re-signed or
    * re-paired.
    */
  private def indexHits(docs: DataFrame, indexBuckets: DataFrame,
                        textCol: String, keep: Seq[String]): DataFrame =
    graft.operators.DedupOps.minhashSignatures(docs, textCol)
      .select(keep.map(col) :+
        posexplode(col("bands")).as(Seq("band", "band_hash")): _*)
      .join(indexBuckets, Seq("band", "band_hash"), "left_semi")
      // the USING join hoists (band, band_hash) first — re-project the
      // caller's columns so both faces see (id[, ts]) rows
      .select(keep.map(col): _*)

  /** Near-dup flags against a stored MinHash index, batch face: the
    * distinct ids of batch docs sharing ≥1 LSH band with the historical
    * index — exactly the candidate probe of DedupOps.incrementalDupCheck
    * (the index+delta shape; generalizes the reference re-running
    * drop_duplicates per batch, /root/reference/preprocessing.py:344-346).
    */
  def indexDupBatch(docs: DataFrame, indexBuckets: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    indexHits(docs, indexBuckets, textCol, Seq(idCol)).dropDuplicates(idCol)

  /** Near-dup flags against a stored MinHash index, streaming face —
    * dedup-at-ingest against the WAREHOUSE, not just the recent window:
    * each incoming doc signature-bands in-stream and band-probes the static
    * index via a stream-static left-semi join (stateless), then the per-doc
    * flag dedups within the watermark, so streaming state tracks the recent
    * window while the historical knowledge lives in the stored index table.
    * Composes with `dedupStream` (exact intra-stream dups) upstream.
    */
  def indexDupStream(docs: DataFrame, indexBuckets: DataFrame, idCol: String,
                     textCol: String, tsCol: String,
                     delay: String = "1 hour"): DataFrame =
    indexHits(docs, indexBuckets, textCol, Seq(idCol, tsCol))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCol)

  /** Composed ingest-time curation gate, batch face — per-arrival VERDICT
    * rows (idCol, lang, pass_struct, is_dup, nll, pass_lm, passed) under
    * the three gates a stream applies at the door: Gopher STRUCTURAL rules
    * (the funnel's stage-1 subset), near-dup flag against the stored
    * MinHash index, and the frozen bigram-LM quality gate at `maxNll`.
    * Docs the LM cannot score (under two scoreable tokens, or a language
    * the model never saw) FAIL the LM gate explicitly (pass_lm = 0) — at
    * ingest there is no later stage to route them, so the gate is
    * conservative; a deployment quarantines them instead of admitting
    * unscored text. `passed` chains all three.
    */
  def ingestGateBatch(docs: DataFrame, model: graft.operators.LmOps.BigramLm,
                      indexBuckets: DataFrame, textCol: String,
                      langCol: String, idCol: String,
                      maxNll: Double = graft.operators.LmOps.NllGateMax): DataFrame = {
    val flags = graft.operators.CurationOps.gopherRules(docs, textCol)
      .select(col(idCol), col(langCol).as("lang"),
        (col("pass_wordcount") * col("pass_meanlen") * col("pass_symbol") *
          col("pass_alpha") * col("pass_repeat")).as("pass_struct"))
    val dups = indexDupBatch(docs, indexBuckets, idCol, textCol)
      .withColumn("is_dup", lit(1))
    val lm = graft.operators.LmOps.qualityGateBatch(docs, model, textCol,
        langCol, idCol, maxNll)
      .select(col(idCol), col("nll"), col("passed").as("pass_lm"))
    flags.join(dups, Seq(idCol), "left")
      .join(lm, Seq(idCol), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(0)))
      .withColumn("pass_lm", coalesce(col("pass_lm"), lit(0)))
      .withColumn("passed",
        (col("pass_struct") === 1 && col("is_dup") === 0 &&
          col("pass_lm") === 1).cast("int"))
  }

  /** The composed gate's STREAMING face — the curation funnel's ingest
    * twin: the three gates fold into one stream with ONE stateful
    * operator. Structural rules filter statelessly first (cheapest gate,
    * nothing downstream pays for a doc that fails it); survivors then fan
    * into two stateless row kinds — per-occurrence LM rows
    * (`scoredBigramRows`, broadcast model joins) and per-band index-probe
    * rows (stream-static left join against the stored bucket table) —
    * which UNION into a single watermarked per-(window, doc) aggregation:
    * nll folds the LM rows, max(hit) folds the probe rows. Emitted
    * survivors = docs passing all three gates, exactly
    * `ingestGateBatch(...).filter(passed = 1)` (spec-pinned parity).
    * State is one row per (window, open doc); everything else is
    * projection + broadcast join.
    */
  def ingestGateStream(docs: DataFrame, model: graft.operators.LmOps.BigramLm,
                       indexBuckets: DataFrame, textCol: String,
                       langCol: String, idCol: String, tsCol: String,
                       maxNll: Double = graft.operators.LmOps.NllGateMax,
                       delay: String = "1 hour"): DataFrame = {
    val structOk = graft.operators.CurationOps.gopherRules(docs, textCol)
      .filter(col("pass_wordcount") === 1 && col("pass_meanlen") === 1 &&
        col("pass_symbol") === 1 && col("pass_alpha") === 1 &&
        col("pass_repeat") === 1)
      .withWatermark(tsCol, delay)
    val lmRows = graft.operators.LmOps
      .scoredBigramRows(structOk, model, textCol, langCol, Seq(idCol, tsCol))
      .select(col(idCol), col(tsCol), col("lang"), lit("lm").as("kind"),
        col("lp"), lit(0).as("hit"))
    val bandRows = graft.operators.DedupOps
      .minhashSignatures(structOk, textCol)
      .select(col(idCol), col(tsCol), col(langCol).as("lang"),
        posexplode(col("bands")).as(Seq("band", "band_hash")))
      .join(indexBuckets.withColumn("mk", lit(1)),
        Seq("band", "band_hash"), "left")
      .select(col(idCol), col(tsCol), col("lang"), lit("dup").as("kind"),
        lit(0.0).as("lp"), coalesce(col("mk"), lit(0)).as("hit"))
    lmRows.unionByName(bandRows)
      .groupBy(window(col(tsCol), "1 hour"), col(idCol), col("lang"))
      .agg(
        round(-sum(when(col("kind") === "lm", col("lp"))) /
          sum(when(col("kind") === "lm", 1)), 6).as("nll"),
        max(col("hit")).as("is_dup"))
      // a doc with no LM rows has nll NULL and fails the gate (the batch
      // face's pass_lm = 0); null <= maxNll is false, so the filter is it
      .filter(col("is_dup") === 0 && col("nll") <= maxNll)
      .select(col(idCol), col("lang"), col("nll"))
  }

  /** Query: the composed ingest gate's per-language audit — the batch face
    * of `ingestGateStream` over the watermark-cut ingest shape the
    * incremental-dedup faces use (history = first 90% of ids, arrivals =
    * the last decile; model and index both frozen from history). Chained
    * counts: arrivals → structural pass → LM pass (its mean NLL beside
    * it — the arrivals straddle the 3.5 gate: per-lang medians 3.42-3.56
    * at sf0.01, so the cut genuinely separates) → and finally not-a-near-
    * dup. On this fixture the dedup gate dominates (the 31-word vocabulary
    * puts ~84% of docs in one minhash cluster, so nearly every arrival
    * collides with history — recorded fixture artifact); the chain order
    * here reports the LM gate over the full structural-survivor set so
    * its verdict is pinned by more than one doc. Output bounded by
    * |langs|.
    */
  def ingestGateQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{DedupOps, LmOps}
    val docs = graft.Tables.documents(spark, dir)
    val (_, cut) = DedupOps.storedIndex(spark, dir)
    // registry-shared distinct bucket table (the stored index's physical
    // layout) instead of a per-run posexplode + distinct exchange
    val idxBuckets = DedupOps.storedIndexBuckets(spark, dir)
    val arrivals = docs.filter(col("doc_id") > cut)
    val model = LmOps.frozenHistoryModel(spark, dir, cut, "text", "lang")
    ingestGateBatch(arrivals, model, idxBuckets, "text", "lang", "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_arrivals"),
        sum(col("pass_struct")).cast("long").as("n_struct"),
        sum(col("pass_struct") * col("pass_lm")).cast("long").as("n_lm"),
        round(avg(when(col("pass_struct") === 1 && col("pass_lm") === 1,
          col("nll"))), 4).as("avg_nll_lm"),
        sum(col("passed")).cast("long").as("n_pass"))
      .orderBy("lang")
  }

  /** Streaming ANN ingest — the DENSE index's ingest twin of
    * `indexDupStream`: arriving vectors are unit-normalized and assigned
    * to the FROZEN coarse quantizer statelessly
    * (IndexMaintOps.assignListExpr — a literal-centroid fold, no state,
    * no shuffle, bit-equal to the batch assignLists), deduped within the
    * watermark against at-least-once re-delivery, and emitted as
    * (vec_id, list) postings ready to append to the stored index table.
    * Appending these to `assignLists(cents, old)` equals
    * `maintainIndex(stored, old, old ∪ new, cents)` for pure additions —
    * the streaming half of the |delta|-cost refresh story: the batch
    * path handles change/remove compaction, the stream handles the
    * arrival firehose, both at the same frozen centroids.
    */
  def ivfIngestStream(vecs: DataFrame, cents: Seq[(Int, Seq[Double])],
                      idCol: String, vecCol: String, tsCol: String,
                      delay: String = "1 hour"): DataFrame = {
    import graft.functions.HashExpressions.unitVector
    import graft.functions.VectorFunctions.asDouble
    vecs
      .select(col(idCol).as("vec_id"), col(tsCol),
        graft.operators.IndexMaintOps
          .assignListExpr(cents, unitVector(asDouble(col(vecCol))))
          .as("list"))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("vec_id")
      .select(col("vec_id"), col("list"))
  }

  /** FIVE-stage ingest gate, batch face — `ingestGateBatch` extended to
    * the full production-funnel surface (`CurationOps.curationFunnelFull`'s
    * ingest twin): structural rules → 13-gram DECONTAMINATION against a
    * frozen eval gram set → near-dup against the stored index → frozen-LM
    * gate → PII SCRUB on the admitted text. The two added stages keep the
    * batch/stream shape: decontam is one broadcast semi-join (the eval set
    * is benchmark-sized by construction), the scrub is a stateless
    * projection over survivors. Verdicts stay TOTAL (one row per arrival,
    * every flag explicit); `scrubbed` carries the redacted text and
    * `n_pii` the per-doc redaction count, so a sink can admit the clean
    * text directly.
    */
  def ingestGateFullBatch(docs: DataFrame,
                          model: graft.operators.LmOps.BigramLm,
                          indexBuckets: DataFrame, evalGrams: DataFrame,
                          textCol: String, langCol: String, idCol: String,
                          maxNll: Double = graft.operators.LmOps.NllGateMax)
      : DataFrame = {
    import graft.operators.CurationOps
    val base = ingestGateBatch(docs, model, indexBuckets, textCol, langCol,
      idCol, maxNll)
    val cont = docs
      .select(col(idCol),
        explode(CurationOps.gramHashes(col(textCol), 13)).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .select(col(idCol)).distinct()
      .withColumn("is_contaminated", lit(1))
    val scrub = CurationOps.scrubPii(
        docs.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col(textCol),
        (col("n_email") + col("n_url") + col("n_phone")).as("n_pii"),
        col("scrubbed"))
    base
      .join(cont, Seq(idCol), "left")
      .withColumn("is_contaminated", coalesce(col("is_contaminated"), lit(0)))
      .join(scrub, Seq(idCol))
      .withColumn("passed",
        (col("pass_struct") === 1 && col("is_contaminated") === 0 &&
          col("is_dup") === 0 && col("pass_lm") === 1).cast("int"))
  }

  /** FIVE-stage ingest gate, STREAMING face — `ingestGateStream` extended
    * with the decontam gate and the per-doc PII count, still through ONE
    * stateful operator: survivors of the stateless structural filter fan
    * into FOUR stateless row kinds — per-bigram LM rows, per-band
    * index-probe rows, per-gram eval-set probe rows (stream-static left
    * join against the frozen gram table), and one per-doc PII-count row —
    * which union into the single watermarked per-(window, doc) fold
    * (nll sum / dup max / contamination max / pii max). Emitted survivors
    * pass all four gates; the scrub itself is a stateless projection a
    * sink applies to the admitted text (the gate emits the redaction
    * count, not the text — state stays fixed-width per open doc).
    * Batch parity with `ingestGateFullBatch` is spec-pinned.
    */
  def ingestGateFullStream(docs: DataFrame,
                           model: graft.operators.LmOps.BigramLm,
                           indexBuckets: DataFrame, evalGrams: DataFrame,
                           textCol: String, langCol: String, idCol: String,
                           tsCol: String,
                           maxNll: Double = graft.operators.LmOps.NllGateMax,
                           delay: String = "1 hour"): DataFrame = {
    import graft.operators.CurationOps
    val structOk = graft.operators.CurationOps.gopherRules(docs, textCol)
      .filter(col("pass_wordcount") === 1 && col("pass_meanlen") === 1 &&
        col("pass_symbol") === 1 && col("pass_alpha") === 1 &&
        col("pass_repeat") === 1)
      .withWatermark(tsCol, delay)
    val lmRows = graft.operators.LmOps
      .scoredBigramRows(structOk, model, textCol, langCol, Seq(idCol, tsCol))
      .select(col(idCol), col(tsCol), col("lang"), lit("lm").as("kind"),
        col("lp"), lit(0).as("hit"))
    val bandRows = graft.operators.DedupOps
      .minhashSignatures(structOk, textCol)
      .select(col(idCol), col(tsCol), col(langCol).as("lang"),
        posexplode(col("bands")).as(Seq("band", "band_hash")))
      .join(indexBuckets.withColumn("mk", lit(1)),
        Seq("band", "band_hash"), "left")
      .select(col(idCol), col(tsCol), col("lang"), lit("dup").as("kind"),
        lit(0.0).as("lp"), coalesce(col("mk"), lit(0)).as("hit"))
    val gramRows = structOk
      .select(col(idCol), col(tsCol), col(langCol).as("lang"),
        explode(CurationOps.gramHashes(col(textCol), 13)).as("gram"))
      .join(evalGrams.withColumn("ck", lit(1)), Seq("gram"), "left")
      .select(col(idCol), col(tsCol), col("lang"), lit("cont").as("kind"),
        lit(0.0).as("lp"), coalesce(col("ck"), lit(0)).as("hit"))
    val piiRows = CurationOps.scrubPii(structOk, textCol)
      .select(col(idCol), col(tsCol), col(langCol).as("lang"),
        lit("pii").as("kind"), lit(0.0).as("lp"),
        (col("n_email") + col("n_url") + col("n_phone")).as("hit"))
    lmRows.unionByName(bandRows).unionByName(gramRows).unionByName(piiRows)
      .groupBy(window(col(tsCol), "1 hour"), col(idCol), col("lang"))
      .agg(
        round(-sum(when(col("kind") === "lm", col("lp"))) /
          sum(when(col("kind") === "lm", 1)), 6).as("nll"),
        coalesce(max(when(col("kind") === "dup", col("hit"))), lit(0))
          .as("is_dup"),
        coalesce(max(when(col("kind") === "cont", col("hit"))), lit(0))
          .as("is_contaminated"),
        coalesce(max(when(col("kind") === "pii", col("hit"))), lit(0))
          .as("n_pii"))
      .filter(col("is_dup") === 0 && col("is_contaminated") === 0 &&
        col("nll") <= maxNll)
      .select(col(idCol), col("lang"), col("nll"), col("n_pii"))
  }

  /** Sink-side admitted-TEXT path for the five-stage gate — the composed
    * example the gate's scaladoc documents. `ingestGateFullStream` emits
    * the redaction COUNT so per-doc state stays fixed-width; the scrubbed
    * text a training sink actually stores is this stateless composition:
    * gate survivors joined back to the arrival source and run through
    * `scrubPii`'s projection. Works unchanged whether `admitted` is the
    * streaming gate output (stream-static join, `docs` = the replayable
    * source the arrivals came from) or the batch face's survivors —
    * parity with `ingestGateFullBatch`'s own `scrubbed` column is
    * spec-pinned, so a consumer cannot mis-wire the admitted-text path.
    */
  def admittedScrubbed(admitted: DataFrame, docs: DataFrame,
                       textCol: String, idCol: String): DataFrame = {
    val scrub = graft.operators.CurationOps
      .scrubPii(docs.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col("scrubbed"))
    admitted.join(scrub, Seq(idCol))
  }

  /** Query: the FIVE-stage ingest gate's per-language audit — the batch
    * face of `ingestGateFullStream` on the watermark-cut ingest shape
    * (history = first 90% of ids → frozen model + stored index; eval gram
    * set = the funnel's bkt &lt; 500 slice, frozen). Chained per-lang
    * counts walk the gate order (structural → clean → LM → full pass
    * incl. not-dup), and the scrub stage reports over ADMITTED docs only:
    * redaction count and the token delta its scrub produces — the
    * ingest-side mirror of the funnel's stage-5 accounting.
    */
  def ingestGateFullQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CurationOps, DedupOps, LmOps, SamplingOps,
      TextAnalysisOps}
    val docs = graft.Tables.documents(spark, dir)
    val (_, cut) = DedupOps.storedIndex(spark, dir)
    // registry-shared distinct bucket table (see ingestGateQuery)
    val idxBuckets = DedupOps.storedIndexBuckets(spark, dir)
    val arrivals = docs.filter(col("doc_id") > cut)
    val model = LmOps.frozenHistoryModel(spark, dir, cut, "text", "lang")
    val evalGrams = docs
      .filter(SamplingOps.hashBucket(col("doc_id"), 10000) < 500)
      .select(explode(CurationOps.gramHashes(col("text"), 13)).as("gram"))
      .distinct()
    ingestGateFullBatch(arrivals, model, idxBuckets, evalGrams,
        "text", "lang", "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_arrivals"),
        sum(col("pass_struct")).cast("long").as("n_struct"),
        sum(col("pass_struct") * (lit(1) - col("is_contaminated")))
          .cast("long").as("n_clean"),
        sum(col("pass_struct") * (lit(1) - col("is_contaminated")) *
          col("pass_lm")).cast("long").as("n_lm"),
        sum(col("passed")).cast("long").as("n_pass"),
        sum(when(col("passed") === 1, col("n_pii")).otherwise(0))
          .cast("long").as("n_pii_redacted"),
        coalesce(sum(when(col("passed") === 1,
          TextAnalysisOps.bpeishTokenCount(col("text")) -
            TextAnalysisOps.bpeishTokenCount(col("scrubbed")))), lit(0L))
          .cast("long").as("token_delta"))
      .orderBy("lang")
  }

  /** Batch twin of ivfIngestStream's assignment (ids + lists only), for
    * spec-level stream/batch parity — identical expression, no watermark.
    */
  def ivfIngestBatch(vecs: DataFrame, cents: Seq[(Int, Seq[Double])],
                     idCol: String, vecCol: String): DataFrame = {
    import graft.functions.HashExpressions.unitVector
    import graft.functions.VectorFunctions.asDouble
    vecs.select(col(idCol).as("vec_id"),
      graft.operators.IndexMaintOps
        .assignListExpr(cents, unitVector(asDouble(col(vecCol))))
        .as("list"))
  }

  /** Span flags against a stored gram index, streaming face — the
    * substring tier's ingest gate (sibling of indexDupStream): each
    * incoming doc grams in-stream (stateless codegen'd kernels) and probes
    * the static index via a stream-static left-semi join; the per-doc flag
    * then dedups within the watermark. A doc is flagged when ANY of its
    * k-token windows already exists in the warehouse — the
    * boilerplate-at-ingest signal the document-level index misses once the
    * surrounding text diverges.
    */
  def spanFlagStream(docs: DataFrame, gramIndex: DataFrame, idCol: String,
                     textCol: String, tsCol: String,
                     delay: String = "1 hour",
                     k: Int = graft.operators.SpanDedupOps.SpanK): DataFrame = {
    import graft.functions.HashExpressions.{rollingHashArray, windowHashList}
    import graft.functions.TextFunctions.tokens
    docs
      .select(col(idCol), col(tsCol),
        explode(windowHashList(rollingHashArray(tokens(col(textCol), 1, 100)), k))
          .as("gram"))
      .join(gramIndex, Seq("gram"), "left_semi")
      .select(col(idCol), col(tsCol))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCol)
  }

  /** Batch twin of spanFlagStream's flag set (ids only):
    * SpanDedupOps.spanHitBatch carries the hit counts; this face matches
    * the streaming output shape for spec-level stream/batch parity.
    */
  def spanFlagBatch(docs: DataFrame, gramIndex: DataFrame, idCol: String,
                    textCol: String,
                    k: Int = graft.operators.SpanDedupOps.SpanK): DataFrame =
    graft.operators.SpanDedupOps.spanHitBatch(docs, gramIndex, idCol,
      textCol, k).select(col(idCol))

  /** True microsecond epoch of a Timestamp — getTime truncates to millis, so
    * sub-millisecond gaps need the nanos field (keeps this sessionizer in
    * exact agreement with the batch twin's unix_micros,
    * RelationalOps.userSessions).
    */
  private def micros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** lastTsMicros = time of the last stage ADVANCE (the strictly-after
    * chain's anchor); lastSeenMicros = time of the user's last event of any
    * type (the idleness clock the eviction timeout runs on).
    */
  case class FunnelState(stage: Int, lastTsMicros: Long, lastSeenMicros: Long)
  case class FunnelProgress(user_id: Long, stage: Int)

  /** Event-time eviction timestamp for a per-user state machine: the state
    * is droppable once the watermark passes `lastTsMicros + ttlMicros`
    * (converted to the ms granularity GroupState timeouts use, rounded UP
    * so the timeout never fires while an in-watermark event could still
    * matter). Clamped above the current watermark — Spark rejects a
    * timeout at or below it, which a late-ish event's timestamp could
    * otherwise produce — so a stale update still evicts on the very next
    * watermark advance.
    */
  private def evictionMs(state: GroupState[_], lastTsMicros: Long,
                         ttlMicros: Long): Long = {
    val base =
      if (lastTsMicros == Long.MinValue) Long.MinValue // no event-time yet
      else math.floorDiv(lastTsMicros + ttlMicros, 1000L) + 1L
    math.max(base, state.getCurrentWatermarkMs + 1L)
  }

  /** Streaming face of the ordered-sequence funnel: a per-user stage
    * machine under `mapGroupsWithState`. Each micro-batch's events for a
    * user are walked in (ts, event_id) order, advancing the stage whenever
    * the NEXT needed type appears strictly after the previous stage time —
    * the greedy earliest-advance walk computes exactly the batch operator's
    * sequential minima (RelationalOps.funnelStages), so in-order ingest
    * matches the batch funnel stage-for-stage (spec-pinned). State per user
    * is two numbers (stage, last stage time); with event-time timeout the
    * entry is EVICTED once the watermark passes the user's last observed
    * event by `ttl` — complete and abandoned funnels both age out, so the
    * state store tracks users active within the ttl horizon, not every
    * user ever seen. An evicted user re-entering restarts at stage 0
    * (spec-pinned): the streaming face answers "funnel progress within the
    * ttl window" at ingest; cumulative all-time funnels are the batch
    * twin's replay job. Stage times are monotone, so an event arriving in
    * a LATER batch with an earlier timestamp cannot retroactively advance
    * a stage it preceded — the documented at-ingest semantics.
    */
  def funnelStream(events: Dataset[Event], stages: Seq[String],
                   delay: String = "30 minutes", ttlHours: Long = 24)
                  (implicit spark: SparkSession): Dataset[FunnelProgress] = {
    import spark.implicits._
    val ttlMicros = ttlHours * 3600L * 1000000L
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelProgress](GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            FunnelProgress(userId, last.stage) // final emission at eviction
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val init = state.getOption
              .getOrElse(FunnelState(0, Long.MinValue, Long.MinValue))
            val next = sorted.foldLeft(init) { (s, e) =>
              val seen = math.max(s.lastSeenMicros, micros(e.ts))
              if (s.stage < stages.length && e.event_type == stages(s.stage) &&
                  micros(e.ts) > s.lastTsMicros)
                FunnelState(s.stage + 1, micros(e.ts), seen)
              else s.copy(lastSeenMicros = seen)
            }
            state.update(next)
            state.setTimeoutTimestamp(
              evictionMs(state, next.lastSeenMicros, ttlMicros))
            FunnelProgress(userId, next.stage)
          }
      }
  }

  case class Event(event_id: Long, user_id: Long, ts: Timestamp,
                   event_type: String, value: Double, props: String)
  case class SessionState(lastTsMicros: Long, nSessions: Long, nEvents: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Stateful streaming sessionization (gap-based, 1 hour) — the streaming
    * twin of RelationalOps.userSessions, via mapGroupsWithState. State per
    * user is three longs, and with EVENT-TIME TIMEOUT the entry is evicted
    * once the watermark passes the user's last event by the session gap —
    * at that point no in-watermark event can extend the current session,
    * so dropping the state cannot move a session boundary: an evicted user
    * re-entering starts a new session (spec-pinned), EXACTLY what the
    * batch twin would decide for an event a full gap after its
    * predecessor. State size therefore tracks users active within the gap
    * horizon, never the total distinct users the stream has ever seen —
    * the difference between a bounded state store and one that grows
    * forever on a 100 TB stream. The one semantic trade: the per-user
    * counters (n_sessions/n_events) cover the user's current activity era
    * — eviction emits the closing totals, then a re-entry counts afresh;
    * all-time cumulative totals are the batch twin's replay job.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Long = 60,
                 delay: String = "30 minutes")
                (implicit spark: SparkSession): Dataset[UserSessions] = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            UserSessions(userId, last.nSessions, last.nEvents) // closing totals
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val init = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
            val next = sorted.foldLeft(init) { (s, e) =>
              val tsMicros = micros(e.ts)
              val newSession = s.lastTsMicros == Long.MinValue ||
                tsMicros - s.lastTsMicros > gapMicros
              SessionState(tsMicros,
                s.nSessions + (if (newSession) 1 else 0), s.nEvents + 1)
            }
            state.update(next)
            state.setTimeoutTimestamp(evictionMs(state, next.lastTsMicros, gapMicros))
            UserSessions(userId, next.nSessions, next.nEvents)
          }
      }
  }
}
