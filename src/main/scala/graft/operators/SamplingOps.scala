package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic hash-based sampling and dataset splitting — the selection
  * tier of a training-data pipeline. Random `df.sample` is useless at
  * 100 TB because reruns, backfills, and per-table joins all need the SAME
  * rows selected; hashing a stable id makes the choice a pure function of
  * the row, so the sample is reproducible across runs, machines, and
  * engines (the DuckDB oracle replays the identical arithmetic).
  *
  * Every operator here is a narrow codegen'd filter/projection — no
  * shuffle, no state — so the plan at 100 TB is scan + filter with the
  * predicate pushed against the id column.
  */
object SamplingOps {

  val P = 1000000007L

  /** Affine hash of a numeric id onto [0, m): ((id mod P)·8191 + 524287)
    * mod P mod m — the engine's MinHash affine family applied to ids. The
    * leading `mod P` keeps every intermediate < 2^63 for ids up to P·P/8191
    * (any realistic id space), so JVM and oracle agree without overflow.
    */
  def hashBucket(id: Column, m: Int): Column =
    ((id % P) * 8191L + 524287L) % P % m

  /** Deterministic Bernoulli sample: keep rows whose id hashes below
    * fraction·10000 of the bucket space (basis-point granularity).
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(idCol), 10000) < math.round(fraction * 10000).toInt)

  /** Train/val/test (or any) split assignment from cumulative weight
    * thresholds over the hash buckets. Weights need not sum to 1; they are
    * normalized. Assignment is per-row deterministic, so every downstream
    * table split on the same id column lands rows in the same partition of
    * the split — the property that keeps doc↔embedding↔metadata joins
    * consistent across the split boundary.
    */
  def assignSplits(df: DataFrame, idCol: String,
                   weights: Seq[(String, Double)]): DataFrame = {
    val total = weights.map(_._2).sum
    val thresholds = weights
      .scanLeft(("", 0.0)) { case ((_, acc), (name, w)) => (name, acc + w / total) }
      .drop(1)
      .map { case (name, cum) => (name, math.round(cum * 10000).toInt) }
    val bucket = hashBucket(col(idCol), 10000)
    val assign = thresholds.init.foldRight(lit(thresholds.last._1)) {
      case ((name, cum), otherwise) => when(bucket < cum, lit(name)).otherwise(otherwise)
    }
    df.withColumn("split", assign)
  }

  /** Per-stratum deterministic sampling: each stratum value gets its own
    * keep-fraction (absent strata keep `default`). The skew tool: cap an
    * over-represented language/source at ingest without a shuffle.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       default: Double = 1.0): DataFrame = {
    val threshold = fractions.foldRight(lit(math.round(default * 10000).toInt)) {
      case ((value, f), otherwise) =>
        when(col(strataCol) === value, lit(math.round(f * 10000).toInt))
          .otherwise(otherwise)
    }
    df.filter(hashBucket(col(idCol), 10000) < threshold)
  }

  /** Deterministic fixed-SIZE uniform sample: the k rows with the smallest
    * id-hashes (id tie-break). Where a fraction sample's size drifts with
    * the corpus, this pins exactly k rows — the eval-set primitive — and
    * plans as TakeOrderedAndProject: per-partition top-k then a k-row
    * merge, never a global sort.
    */
  def fixedSample(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.orderBy(((col(idCol) % P) * 8191L + 524287L) % P, col(idCol)).limit(k)

  /** Per-GROUP fixed-size uniform sample: the k smallest-hash rows of each
    * group (ties to the id) — one balanced eval set per stratum in a single
    * pass, reproducible by construction like every selection here. The
    * rank runs as a window partitioned by the group, which Spark's
    * window-group-limit rewrite executes as per-partition top-k (each task
    * keeps k rows per group before the shuffle) — never a global sort, and
    * the group sizes never hit memory the way collect_list-then-slice
    * would.
    */
  def groupFixedSample(df: DataFrame, groupCol: String, idCol: String,
                       k: Int): DataFrame = {
    val h = ((col(idCol) % P) * 8191L + 524287L) % P
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(h, col(idCol))
    // collision-safe scratch name: a bare "rk" would silently overwrite
    // (and then destroy) a caller's own rk column
    df.withColumn("__gfs_rk", row_number().over(w))
      .filter(col("__gfs_rk") <= k).drop("__gfs_rk")
  }

  /** Domain mixing toward a target TOKEN distribution: given per-domain
    * target weights, the largest feasible total is T = min_d(supply_d/w_d)
    * (no domain can be asked for more tokens than it has), each domain's
    * keep rate is w_d·T/supply_d — the binding domain keeps ~everything —
    * and rows are then selected deterministically by id hash at basis-point
    * granularity. Domains absent from `weights` are dropped.
    *
    * Shape at any scale: one supply aggregate (|domains| rows, broadcast
    * back) + one narrow filter scan — computing the rates never shuffles
    * the corpus. Doc-level hashing approximates the token-level rate; the
    * realized mix converges to the target as docs-per-domain grows.
    */
  /** Per-domain (domain, w, n_total, supply, keep_bp) rate table — the
    * |domains|-row broadcast side of the mix.
    */
  def mixRates(df: DataFrame, domainCol: String, tokensExpr: Column,
               weights: Seq[(String, Double)]): DataFrame = {
    val w = df.sparkSession.createDataFrame(weights.sortBy(_._1))
      .toDF(domainCol, "w")
    val supply = df.join(broadcast(w), domainCol)
      .groupBy(col(domainCol), col("w"))
      .agg(count(lit(1)).as("n_total"), sum(tokensExpr).cast("long").as("supply"))
    val tstar = supply.agg(min(col("supply") / col("w")).as("tstar"))
    // the binding domain (supply/w == T*) keeps everything BY CONSTRUCTION;
    // pin it to 10000 bp explicitly — w·T*/supply can float to 0.9999…,
    // flooring to 9999 and silently dropping ~0.01% of that domain
    supply.crossJoin(broadcast(tstar))
      .withColumn("keep_bp",
        when(col("supply") / col("w") === col("tstar"), lit(10000L))
          .otherwise(least(lit(10000L),
            floor(col("w") * col("tstar") / col("supply") * 10000))
            .cast("long")))
  }

  /** Temperature-based mixing rates (mT5/XLM-R α-sampling): instead of
    * hand-written weights, the TARGET shares are derived from the corpus'
    * own shares as q_i ∝ p_i^α — α < 1 flattens the distribution, up-
    * weighting low-resource domains without inverting the ranking. The
    * keep rate realizes q from p by downsampling only: rate_i =
    * (q_i/p_i)·min_j(p_j/q_j), so the most-up-weighted domain keeps
    * everything and the rest scale down proportionally.
    *
    * Scale shape: one supply aggregate → a |domains|-row frame; the
    * windows below run over that bounded frame, never the corpus.
    */
  def temperatureRates(df: DataFrame, domainCol: String,
                       tokensExpr: Column, alpha: Double): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    df.groupBy(col(domainCol))
      .agg(sum(tokensExpr).cast("long").as("n_tokens"))
      // a domain with zero token supply has p = 0, so q/p (and the p/q
      // inside the global min) would be null-on-divide and silently poison
      // every domain's rate — a supply-less domain has nothing to sample,
      // so it is excluded from the plan, not null-rated (spec-pinned)
      .filter(col("n_tokens") > 0)
      .withColumn("p", col("n_tokens") / sum(col("n_tokens")).over(all))
      .withColumn("q_raw", pow(col("p"), lit(alpha)))
      .withColumn("q", col("q_raw") / sum(col("q_raw")).over(all))
      .withColumn("rate",
        least(lit(1.0), col("q") / col("p") * min(col("p") / col("q")).over(all)))
      .select(col(domainCol), col("n_tokens"),
        round(col("p"), 4).as("share"),
        round(col("q"), 4).as("target_share"),
        round(col("rate"), 4).as("rate"))
  }

  /** Query: α = 0.7 temperature rates over per-language BPE-ish token
    * supply — the planning table a mixToTarget selection consumes.
    */
  def temperatureRatesProfile(spark: SparkSession, dir: String): DataFrame =
    temperatureRates(Tables.documents(spark, dir), "lang",
      TextAnalysisOps.bpeishTokenCount(col("text")), alpha = 0.7)
      .orderBy(col("lang"))

  def mixToTarget(df: DataFrame, idCol: String, domainCol: String,
                  tokensExpr: Column,
                  weights: Seq[(String, Double)]): DataFrame = {
    val rates = mixRates(df, domainCol, tokensExpr, weights)
    df.join(broadcast(rates.select(col(domainCol), col("keep_bp"))), domainCol)
      .filter(hashBucket(col(idCol), 10000) < col("keep_bp"))
  }

  /** Query: mix the documents fixture toward a 50/20/10/10/10 per-language
    * token target (BPE-ish counts) — per-domain supply, derived keep rate,
    * and the realized selection.
    */
  def mixProfile(spark: SparkSession, dir: String): DataFrame = {
    val weights = Seq("en" -> 0.5, "zh" -> 0.2, "de" -> 0.1,
      "es" -> 0.1, "fr" -> 0.1)
    // token counts computed ONCE; the persisted staging frame serves the
    // supply aggregate, the selection, and the kept-token audit
    val d = graft.Caching.track(Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        TextAnalysisOps.bpeishTokenCount(col("text")).as("n_tokens")))
    val rates = graft.Caching.track(
      mixRates(d, "lang", col("n_tokens"), weights))
    val kept = d
      .join(broadcast(rates.select(col("lang"), col("keep_bp"))), "lang")
      .filter(hashBucket(col("doc_id"), 10000) < col("keep_bp"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).cast("long").as("tokens_kept"))
    rates
      .join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_total"), col("supply"), col("keep_bp"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
      .orderBy("lang")
  }

  /** Quality-budgeted selection rates: fill a token budget from the BEST
    * quality buckets down, WITHOUT a global sort. `perDoc` carries staged
    * (quality, n_tokens) columns; quality is discrete (the indicator score)
    * or pre-bucketed, so the per-bucket aggregate is tiny and its top-down
    * cumulative window runs over bucket rows only (the sketch/grid
    * precedent for deliberately small unpartitioned windows). Buckets that
    * fit wholly keep everything (10000 bp), the boundary bucket keeps the
    * remainder's fraction, lower buckets drop.
    */
  def budgetRates(perDoc: DataFrame, budget: Long): DataFrame = {
    val b = perDoc.groupBy(col("quality"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    b.withColumn("cum_above",
        coalesce(sum(col("tokens")).over(w), lit(0L)).cast("long"))
      .withColumn("keep_bp",
        when(col("cum_above") + col("tokens") <= budget, lit(10000L))
          .when(col("cum_above") >= budget, lit(0L))
          .otherwise(floor((lit(budget) - col("cum_above")) * lit(1.0)
            / col("tokens") * 10000).cast("long")))
      .drop("cum_above")
  }

  /** The ACTION form: rows of `df` (staged quality/n_tokens columns)
    * surviving the budget — deterministic id-hash fill of the boundary
    * bucket, like every selection in this tier.
    */
  def budgetSelect(df: DataFrame, idCol: String, budget: Long): DataFrame = {
    val rates = budgetRates(df, budget)
    df.join(broadcast(rates.select(col("quality"), col("keep_bp"))), "quality")
      .filter(hashBucket(col(idCol), 10000) < col("keep_bp"))
  }

  /** Query: select the best-quality docs until a 20k-token budget fills —
    * per-quality-bucket supply, derived keep rate, and realized selection.
    */
  def budgetProfile(spark: SparkSession, dir: String): DataFrame = {
    // signals staged once as real columns (the AssemblyOps HOF lesson)
    val staged = Tables.documents(spark, dir).select(col("doc_id"), col("text"),
      graft.functions.TextFunctions.normalized(col("text")).as("norm"),
      graft.functions.TextFunctions.tokens(col("text"), 1, 100).as("toks"))
    val perDoc = graft.Caching.track(staged.select(col("doc_id"),
      TextAnalysisOps.qualityScoreFrom(col("text"), col("norm"), col("toks"))
        .as("quality"),
      TextAnalysisOps.bpeishTokenCount(col("text")).as("n_tokens")))
    val rates = graft.Caching.track(budgetRates(perDoc, 20000L))
    val kept = perDoc
      .join(broadcast(rates.select(col("quality"), col("keep_bp"))), "quality")
      .filter(hashBucket(col("doc_id"), 10000) < col("keep_bp"))
      .groupBy(col("quality"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).cast("long").as("tokens_kept"))
    rates
      .join(kept, Seq("quality"), "left")
      .select(col("quality"), col("n_docs"), col("tokens"), col("keep_bp"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
      .orderBy(col("quality").desc)
  }

  /** Leakage-safe split assignment: documents in the same near-duplicate
    * cluster MUST land in the same split, or the eval set leaks training
    * text (the classic contamination path a doc-id hash split cannot see —
    * near-dup copies hash independently). The split is assigned on the
    * cluster LABEL, so the whole group moves together; docs outside any
    * cluster (or with no label row) fall back to their own id — exactly
    * the per-doc hash split for the non-duplicated majority.
    *
    * Scale shape: one left join to the (id, label) frame the dedup tier
    * already produces — zero-exchange on an id-bucketed layout — then the
    * same narrow codegen'd bucket arithmetic as `assignSplits`.
    */
  def leakageSafeSplits(docs: DataFrame, labels: DataFrame, idCol: String,
                        weights: Seq[(String, Double)]): DataFrame =
    assignSplits(
      docs.join(labels.select(col(idCol), col("label")), Seq(idCol), "left")
        .withColumn("group_key", coalesce(col("label"), col(idCol)))
        .drop("label"),
      "group_key", weights)

  /** Query: leakage-safe 90/5/5 split over the minhash near-dup clusters —
    * per split: docs, distinct groups, and how many docs a naive id-hash
    * split would have placed elsewhere (the leakage mass this operator
    * exists to prevent).
    */
  def leakageSafeSplitProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val labels = DedupOps.minhashLabels(spark, dir)
    val weights = Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05)
    val naive = assignSplits(docs.select("doc_id"), "doc_id", weights)
      .withColumnRenamed("split", "naive_split")
    leakageSafeSplits(docs.select("doc_id"), labels, "doc_id", weights)
      .join(naive, "doc_id")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("group_key")).as("n_groups"),
        sum(when(col("naive_split") =!= col("split"), 1).otherwise(0))
          .cast("long").as("n_moved"))
      .orderBy(col("split"))
  }

  /** Query: 90/5/5 split of the documents fixture — per (split, lang)
    * counts plus id bounds; the ratios land within basis-point noise of the
    * weights.
    */
  def splitProfile(spark: SparkSession, dir: String): DataFrame =
    assignSplits(Tables.documents(spark, dir), "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))

  /** Query: per-language profile of a fixed 100-doc hash sample. */
  def fixedSampleProfile(spark: SparkSession, dir: String): DataFrame =
    fixedSample(Tables.documents(spark, dir), "doc_id", 100)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))

  /** Query: a 50-doc-per-language eval sample — size, id range, and the
    * hash-order head so the oracle pins WHICH docs were taken, not just how
    * many.
    */
  def groupFixedSampleProfile(spark: SparkSession, dir: String): DataFrame =
    groupFixedSample(Tables.documents(spark, dir), "lang", "doc_id", 50)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        sum(col("doc_id")).as("sum_doc_id"))

  /** Query: per-language stratified downsample (ko capped at 30%, en at
    * 60%) — kept vs total per language, with the realized keep rate.
    */
  def stratifiedProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val kept = stratifiedSample(docs, "doc_id", "lang",
      Map("ko" -> 0.30, "en" -> 0.60), default = 1.0)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
      .join(kept, Seq("lang"), "left")
      .select(col("lang"), coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("n_total"),
        round(coalesce(col("n_kept"), lit(0L)) / col("n_total"), 4).as("keep_rate"))
  }

  /** DSIR hashed-feature space size (Xie et al. 2023, arXiv:2302.03169 use
    * 10k buckets over n-grams; 1024 matches the engine's sketch widths at
    * fixture scale — the bucket count is the bias/variance knob, not a
    * correctness one).
    */
  val DsirBuckets = 1024

  /** Per-doc DSIR importance weights: log p_target(x) − log p_raw(x) under
    * add-one-smoothed hashed token-unigram bag models — the published
    * data-selection estimator (Xie et al. 2023), deterministic variant
    * (their Gumbel-noise resampling replaced by the weight itself; a
    * pipeline keeps w ≥ cut, or feeds w into `stratifiedSample`).
    *
    * Scale shape: the two feature models are `DsirBuckets`-row frames built
    * by one map-side-combined aggregate over the SAME hashed instance frame
    * (target = a lang/source predicate over it), then broadcast; scoring is
    * one broadcast join + per-doc sum. No shuffle grows with the corpus
    * beyond the per-doc instance aggregate. Zero-token docs have no
    * instances and drop — they carry no evidence either way.
    */
  /** The fitted DSIR model: per-bucket log-likelihood ratio rows (b, lrat)
    * — `DsirBuckets`-bounded, the broadcast side every scorer (batch or
    * stream-static) joins. Buckets never seen in the raw corpus carry no
    * row; a scored doc's tokens in such buckets contribute nothing (the
    * same inner-join semantics on both faces).
    */
  def dsirModel(inst: DataFrame, targetPred: Column): DataFrame = {
    // ONE aggregate over the instance frame builds BOTH per-bucket count
    // columns (target counts as a conditional sum), and the corpus totals
    // re-aggregate from the DsirBuckets-bounded result instead of paying
    // two more full passes — through r17 this ran three separate corpus
    // aggregates (rc, filtered tc, totals), i.e. three tokenize+explode
    // scans per model build (guide §1.2/§2.3: fewer passes, aggregate
    // before you shuffle). Values are bit-identical: tc/rc/ttot/rtot are
    // exact long sums of the same multiset regrouped, and the lrat
    // expression is unchanged.
    val perB = inst.groupBy("b").agg(
      sum(col("n")).as("rc"),
      sum(when(targetPred, col("n")).otherwise(0L)).as("tc"))
    val totals = perB.agg(
      sum(col("tc")).as("ttot"), sum(col("rc")).as("rtot"))
    perB
      .crossJoin(broadcast(totals))
      .withColumn("lrat",
        log((coalesce(col("tc"), lit(0L)) + 1).cast("double")
          / (col("ttot") + DsirBuckets))
          - log((col("rc") + 1).cast("double") / (col("rtot") + DsirBuckets)))
      .select("b", "lrat")
  }

  def dsirWeights(inst: DataFrame, targetPred: Column): DataFrame = {
    // persist the pre-aggregated instance frame: it feeds the model build
    // AND the scoring join, and without the barrier each consumer re-runs
    // the tokenize+explode+partial-aggregate scan (the narrow post-agg
    // (doc_id, lang, b, n) rows are cheap to hold — this is NOT the
    // array-column caching the decontam note warns about). At warehouse
    // scale this intermediate is the written hashed-instances table DSIR
    // deployments keep beside the corpus.
    val tracked = graft.Caching.track(inst)
    // 6-dp pre-round: the per-doc sum is the one float fold (house LM-band
    // guard against last-ulp ln differences across engines)
    tracked.join(broadcast(dsirModel(tracked, targetPred)), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(round(sum(col("lrat") * col("n")), 6).as("w"))
  }

  /** Query: DSIR selection audit with English as the target domain — the
    * per-(lang, weight-band) histogram a selection cut is read from;
    * output bounded by |langs| × bands. Recorded finding: the fixture's
    * five languages share ONE 31-word vocabulary (lang is metadata, not a
    * distribution), so the estimator correctly reports NO separation — en
    * bands sit level with the rest, weights all negative (the smoothing
    * penalty of a noisier target model). The spec pins that the same
    * estimator separates cleanly the moment target and raw vocabularies
    * actually differ.
    */
  def dsirProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val inst = dsirInstances(docs, "text")
    dsirWeights(inst, col("lang") === "en")
      .groupBy(col("lang"), floor(col("w")).cast("int").as("w_band"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("w")), 4).as("avg_w"))
      .orderBy(col("lang"), col("w_band"))
  }

  /** Per-doc hashed-unigram bucket instances (doc_id, lang, b, n) — the
    * input shape of `dsirModel`/`dsirWeights`. Text is NORMALIZED before
    * token hashing: `HashKernels.tokenHashes` splits on single spaces and
    * assumes the house normal form, so hashing raw text (mixed case,
    * punctuation, runs of whitespace) would bucket tokens differently from
    * every other consumer of the kernel (gramHashes, simhashFingerprints)
    * and from the select_dsir oracle. Spec-pinned on un-normalized input.
    */
  def dsirInstances(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        explode(graft.functions.HashExpressions.tokenHashesK(
          graft.functions.TextFunctions.normalized(col(textCol)))).as("h"))
      .withColumn("b", col("h") % DsirBuckets)
      .groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("n"))
}
