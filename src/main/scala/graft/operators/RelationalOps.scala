package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator suite over the TPC-H-ish fixtures.
  *
  * The reference's relational surface (SURVEY.md §2.2–2.7: project, cast,
  * filter, dedup, date parts, group-agg, top-k windows, set ops) exercised as
  * declarative DataFrame plans, plus the joins the reference does implicitly
  * via index alignment (SURVEY.md §2.4).
  *
  * Scale notes (100 TB design intent, verified via `.explain("formatted")`):
  *   - Filters are plain column predicates → pushed into the parquet scan.
  *   - Dimension joins (`nation`, `region`, `supplier`) use an explicit
  *     `broadcast()` hint — no shuffle of the fact side.
  *   - Fact-fact joins shuffle on the join key only after aggregation-safe
  *     projection (Catalyst prunes columns; nothing reads all columns).
  *   - Aggregations are partial+final hash aggregates (map-side combine).
  *   - Top-k uses window `row_number` with a deterministic tie-break so plans
  *     stay rank-prunable (AQE) and results are reproducible.
  *
  * All money sums are rounded in the query itself so DuckDB-oracle hash
  * comparison is insensitive to summation order (floating-point association).
  */
object RelationalOps {

  /** Q1-style pricing summary: scan + pushed filter + 2-key hash agg. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1997-09-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Customer rollup through two broadcast dimension joins. */
  def customerByRegion(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
  }

  /** Fact-fact-dim join: lineitem ⋈ orders (shuffle on orderkey) ⋈ customer
    * (broadcast at fixture scale; would shuffle-hash at 100 TB — AQE decides).
    */
  def revenueBySegment(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q3 shape (shipping priority): top-10 unshipped-order revenues
    * for one market segment. Dates straddle so the lineitem/orders filters
    * both prune before the join; the rank key is the ROUNDED revenue with
    * an orderkey tie-break, so the top-10 selection never depends on
    * double-summation order.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1997-06-15 00:00:00"))
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5 shape (local supplier volume): revenue where the customer
    * and supplier share a nation, per nation of one region, one order
    * year. Two fact-fact shuffles (orderkey, suppkey); every dimension is
    * a broadcast; the local-supplier predicate is the c/s nationkey
    * equality applied AFTER both fact joins.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q18 shape (large-volume customers): orders whose total line
    * quantity clears a threshold, with customer detail — a
    * semi-join-by-aggregate (the HAVING subquery) feeding a three-way
    * join. The qualifying-order set is the aggregate's output, so the
    * fact table is scanned twice but shuffled on the same orderkey both
    * times (one partitioning reused); ordering rides the RAW
    * o_totalprice column, never an aggregated double. Quantities are
    * integer-valued doubles, so total_qty is exact on both engines.
    */
  def largeVolumeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val big = l.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 180.0)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), round(col("total_qty"), 2).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** Left-semi join (EXISTS): orders having a deep-discount line. */
  def ordersWithDiscount(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir).filter(col("l_discount") > 0.05)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_totalprice"))
  }

  /** Left-anti join (NOT EXISTS): customers with no high-value order. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        min(col("c_custkey")).as("min_custkey"))
  }

  /** Selective scan: every predicate should appear in PushedFilters. */
  def selectiveScan(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Top-3 orders per priority — deterministic tie-break on key. */
  def topOrdersPerPriority(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
  }

  /** Global ordered limit → TakeOrderedAndProject (no full sort at scale). */
  def top100Lines(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .limit(100)

  /** Exact distinct counts per group (shuffle-heavy; the approx_ variant is
    * the 100 TB path — kept exact here for oracle comparability).
    */
  def distinctPartsPerFlag(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_lines"))

  /** INTERSECT / EXCEPT / UNION over nation keys of two entity tables. */
  def nationSetOps(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
    val sn = Tables.supplier(spark, dir).select(col("s_nationkey").as("nk"))
    val both = cn.intersect(sn).withColumn("tag", lit("both"))
    val custOnly = cn.except(sn).withColumn("tag", lit("customer_only"))
    val supOnly = sn.except(cn).withColumn("tag", lit("supplier_only"))
    both.unionByName(custOnly).unionByName(supOnly).select(col("tag"), col("nk"))
  }

  /** Date-part projection + group (reference P6/F8). */
  def ordersByYearMonth(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_totalprice"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_day"))

  /** Per-customer activity span in days (reference A3 datediff semantics). */
  def customerOrderSpan(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        datediff(max(col("o_orderdate")), min(col("o_orderdate"))).as("span_days"))

  /** JSON extraction from the events props column (engine built-in; the
    * fixture's `props` is a JSON object — SURVEY.md §2.8 note).
    */
  def eventPropsStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(avg(col("k")), 4).as("avg_k"),
        max(col("k")).as("max_k"))

  /** Sessionization-lite via lag(): count 1-hour-gap session starts/user. */
  def userSessions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 3600L * 1000000L, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("new_session")).as("n_sessions"))
  }

  /** ROLLUP over two grouping columns (subtotals + grand total). */
  def lineStatusRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))

  /** String-function projection block (reference F6/F7/F11 analogues). */
  def partTypeStats(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        split(col("p_type"), " ").getItem(0).as("type_head"),
        col("p_brand"),
        col("p_size"),
        upper(col("p_name")).as("p_name_u"))
      .groupBy(col("type_head"), col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        round(avg(col("p_size")), 4).as("avg_size"),
        max(col("p_name_u")).as("max_name"))

  /** Batch analogue of the streaming tumbling-window count (§2.10): the same
    * groupBy(window) shape Structured Streaming runs incrementally.
    */
  /** As-of join, window-formulated: for each `right`-type event, attach the
    * most recent `left`-type event at or before it (per user, ties broken by
    * event_id). A join-based as-of is O(n·m) per key; the union+window form
    * is one sort per user partition — the scalable shape, and what AQE can't
    * fix about a naive range join.
    */
  def asofJoin(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type").isin(leftType, rightType))
      .withColumn("left_mark",
        when(col("event_type") === leftType,
          struct(col("ts").as("lts"), col("event_id").as("lid"))))
      .withColumn("last_left", last(col("left_mark"), ignoreNulls = true).over(w))
      .filter(col("event_type") === rightType && col("last_left").isNotNull)
      .select(
        col("user_id"), col("event_id").as("right_id"),
        col("last_left.lid").as("left_id"),
        (unix_micros(col("ts")) - unix_micros(col("last_left.lts")))
          .as("micros_since"))
  }

  /** Query: for every purchase, the most recent click at or before it. */
  def purchaseAsofClick(spark: SparkSession, dir: String): DataFrame =
    asofJoin(Tables.events(spark, dir), "click", "purchase")

  /** Per-user sessions as explicit [start, end] micros intervals — the
    * interval face of userSessions' 1-hour-gap rule.
    */
  def userSessionIntervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 3600L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("s_start"), max(col("us")).as("s_end"))
  }

  /** Bucketized point-in-interval RANGE join — the pattern Spark's planner
    * would otherwise execute as a broadcast-nested-loop (no equi key):
    * intervals explode into fixed-width buckets (len/width + 1 rows each),
    * points hash into exactly one bucket, the join runs as a plain shuffle
    * equi-join on the bucket key, and the exact containment predicate
    * prunes edge hits. Shuffle volume ≈ points + Σ interval_len/width;
    * pick `bucketWidth` near the typical interval length. Columns
    * `pointCol`/`startCol`/`endCol` are numeric (e.g. epoch micros).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
                startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    // integer div (`div`), not `/`: Spark's / on longs yields DOUBLE
    val p = points.withColumn("__bkt",
      expr(s"CAST($pointCol AS BIGINT) div $bucketWidth"))
    val iv = intervals.withColumn("__bkt",
      explode(sequence(expr(s"CAST($startCol AS BIGINT) div $bucketWidth"),
        expr(s"CAST($endCol AS BIGINT) div $bucketWidth"))))
    p.join(iv, "__bkt")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bkt")
  }

  /** Query: concurrent activity per user — for each of a user's sessions,
    * how many OTHER users' events fall inside its span; the session
    * intervals come from the 1-hour-gap rule and the point-in-interval
    * pairing runs through the bucketized range join (bucket = 1 h).
    */
  def concurrentSessionActivity(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val sessions = userSessionIntervals(ev)
    val points = ev.select(col("user_id").as("p_user"),
      unix_micros(col("ts")).as("p_us"))
    val perSession = rangeJoin(points, sessions, "p_us", "s_start", "s_end",
      bucketWidth = 3600L * 1000000L)
      .filter(col("p_user") =!= col("user_id"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_concurrent"))
    sessions
      .join(perSession, Seq("user_id", "session_id"), "left")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(coalesce(col("n_concurrent"), lit(0L))).cast("long")
          .as("n_concurrent"))
  }

  /** Skew-resistant equi-join: salt the (potentially skewed) fact side into
    * `salts` buckets and replicate the dimension side across them, so one
    * hot key spreads over `salts` tasks instead of one straggler. Result is
    * identical to a plain join — only the shuffle layout changes. (AQE skew
    * handling covers sort-merge joins; explicit salting is the pattern for
    * aggregations-after-join and for engines/plans AQE can't rewrite.)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Query: orders ⋈ customer via the salted path — result must equal the
    * plain join (the oracle compares against an ordinary SQL join).
    */
  def saltedOrderJoin(spark: SparkSession, dir: String): DataFrame =
    saltedJoin(
      Tables.orders(spark, dir).withColumnRenamed("o_custkey", "c_custkey"),
      Tables.customer(spark, dir).select("c_custkey", "c_mktsegment"),
      "c_custkey", salts = 8)
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_totalprice"))

  /** CUBE over two dimensions (grouping-set family; ROLLUP's sibling). */
  def lineCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))

  /** A3 — daily counts, then scalar stats over the daily series plus the
    * covered period in days (the reference's date-distribution block,
    * preprocessing.py:630-637): a two-level aggregation.
    */
  def dailyOrderStats(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
    daily.agg(
      count(lit(1)).as("n_days"),
      round(avg(col("n")), 4).as("mean_daily"),
      max(col("n")).as("max_daily"),
      min(col("n")).as("min_daily"),
      datediff(max(col("day")), min(col("day"))).as("span_days"))
  }

  /** Rolling z-score anomaly detection over daily event counts — the
    * ingest-monitoring face: each day scored against the trailing 7-day
    * window (excluding itself), |z| > 2 flagged. The global-order window
    * runs over the DAY-sized aggregate (bounded by the time span), never
    * the event rows — at 100 TB the frame is still just one row per day.
    */
  /** Score a (day: date, n: long) daily-count frame against its trailing
    * 7-day window (current day excluded); |z| > 2 flagged, warmup days
    * (and zero-variance windows) unflagged with null z.
    */
  def anomalyScore(daily: DataFrame): DataFrame = {
    val trailing = Window.orderBy(col("day")).rowsBetween(-7, -1)
    daily
      .withColumn("mu", avg(col("n")).over(trailing))
      .withColumn("sd", stddev_samp(col("n").cast("double")).over(trailing))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
        round(col("mu"), 4).as("mu"),
        round(col("sd"), 4).as("sd"),
        round(when(col("sd") > 0, (col("n") - col("mu")) / col("sd")), 4)
          .as("z"))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > 2.0, lit(false)))
      .orderBy(col("day"))
  }

  def dailyAnomalies(spark: SparkSession, dir: String): DataFrame =
    anomalyScore(Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")))

  /** Weekly cohort retention: users grouped by first-seen week, counted
    * distinct per (cohort week, weeks-since-cohort). Two user-keyed
    * aggregates and one user-keyed join — nothing larger than
    * (user, week) rows ever shuffles.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val cohort = events.groupBy(col("user_id"))
      .agg(date_format(date_trunc("week", min(col("ts"))), "yyyy-MM-dd")
        .as("cohort_week"))
    val activity = events
      .select(col("user_id"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
      .distinct()
    activity.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(to_date(col("week")), to_date(col("cohort_week"))) / 7)
          .cast("int")
          .as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  def hourlyEventCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))

  /** Join-key skew diagnostic: rows-per-key distribution stats for a
    * prospective join/agg key — the operational check that decides between
    * a plain join, `broadcast`, `saltedJoin`, or AQE skew handling BEFORE
    * a 100 TB shuffle discovers the hot key the hard way. One groupBy on
    * the key (the same shuffle the join would pay, at count-only width)
    * plus bounded reads over the per-key counts.
    */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val perKey = graft.Caching.track(
      df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n")))
    val stats = perKey.agg(
      count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
      max(col("n")).as("max_n"))
    val heavy = perKey.crossJoin(broadcast(stats))
      .filter(col("n") > lit(2) * (col("n_rows") / col("n_keys")))
      .agg(count(lit(1)).as("n_heavy"))
    stats.crossJoin(broadcast(heavy))
      .select(col("n_keys"), col("n_rows"), col("max_n"),
        round(col("n_rows") / col("n_keys"), 4).as("mean_n"),
        round(col("max_n") / (col("n_rows") / col("n_keys")), 4).as("skew_ratio"),
        col("n_heavy"))
  }

  /** Query: skew profile of orders.o_custkey (the key `rel_salted_join`
    * salts).
    */
  def skewProfileQuery(spark: SparkSession, dir: String): DataFrame =
    keySkewProfile(Tables.orders(spark, dir), "o_custkey")

  /** Ordered-sequence funnel: per user, the earliest time each stage could
    * complete given the previous stage's completion (t_k = min ts of stage
    * k STRICTLY after t_{k-1}). Built as a chain of filter→agg→join steps —
    * every shuffle keys on the user, so Spark reuses one exchange across
    * the chain and AQE sees ordinary equi-joins; per-user event lists are
    * never collected (the collect_list formulation caps at executor memory
    * on power-law users; this one never materializes a user's history).
    * Returns one frame per stage: (userCol, t) of users who reached it.
    */
  def funnelStages(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String]): Seq[DataFrame] =
    stages.tail.scanLeft(
      events.filter(col(typeCol) === stages.head)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))) { (prev, stage) =>
      events.filter(col(typeCol) === stage)
        .join(prev.withColumnRenamed("t", "t_prev"), userCol)
        .filter(col(tsCol) > col("t_prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    }

  /** Query: the view → click → purchase funnel over the events fixture —
    * per stage, users reaching it and the conversion rate vs stage 1.
    */
  def funnelQuery(spark: SparkSession, dir: String): DataFrame = {
    val stages = Seq("view", "click", "purchase")
    val reached = funnelStages(Tables.events(spark, dir),
      "user_id", "ts", "event_type", stages)
    val counts = stages.zip(reached).zipWithIndex.map { case ((s, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(s).as("event_type"), col("n_users"))
    }.reduce(_ unionByName _)
    val base = counts.filter(col("stage") === 1)
      .select(col("n_users").as("n_base"))
    counts.crossJoin(broadcast(base))
      .select(col("stage"), col("event_type"), col("n_users"),
        round(col("n_users") / col("n_base"), 4).as("rate"))
      .orderBy("stage")
  }
}
