package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Physical-layout behaviors the 100 TB posture depends on: partitioned
  * writes with partition-pruned reads, and predicate pushdown reaching the
  * parquet scan.
  */
class PartitioningSpec extends SparkSuite {
  private val dir = SparkSpec.FixtureDir

  test("partitionBy write + partition-pruned read") {
    val tmp = Files.createTempDirectory("graft-part").toString
    val orders = Tables.orders(spark, dir)
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.partitionBy("o_year").mode("overwrite").parquet(s"$tmp/orders")
    val someYear = orders.select(min("o_year")).collect()(0).getInt(0)
    val pruned = spark.read.parquet(s"$tmp/orders")
      .filter(col("o_year") === someYear)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains(s"o_year#") || plan.contains("isnotnull(o_year"))
    assert(pruned.count() ==
      orders.filter(col("o_year") === someYear).count())
    // pruned scan must touch only the one partition directory
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!scanned.contains(s"o_year=${someYear + 1}"))
  }

  test("predicate pushdown reaches the parquet scan on fixture tables") {
    val q = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") < 10 && col("l_discount") > 0.05)
      .select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("LessThan(l_quantity,10.0)"))
    assert(plan.contains("GreaterThan(l_discount")) // toString truncates args
    // column pruning: scan schema carries only what the query needs
    assert(plan.contains("ReadSchema") && !plan.contains("l_comment"))
  }

  test("the events ts-relabel does not block column pruning") {
    // the Tables contract rewrites `ts` via withColumn; Catalyst must still
    // prune the scan to the selected columns through that Project
    val q = Tables.events(spark, dir).select("event_type")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("props") && !plan.contains("user_id"),
      "events scan reads pruned columns through the contract relabel")
  }

  test("the events ts-relabel does not block predicate pushdown on ts") {
    // the NTZ->LTZ relabel is a cast; under the UTC session Catalyst
    // unwraps it, so a time-range filter still reaches the parquet scan
    val q = Tables.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-10").cast("timestamp"))
      .select("event_id", "ts")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(ts"),
      s"ts range filter not pushed: ${plan.linesIterator.filter(_.contains("FileScan")).mkString}")
  }

  test("broadcast join is chosen for dimension-sized tables") {
    val joined = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("top-words ranking plans as TakeOrderedAndProject, never a full-vocab Window") {
    // regression pin for the round-3 fix: the coherence family's top-word
    // stage must keep the per-partition top-n plan; the only Window runs
    // over the n-row limit result
    val plan = operators.TopicMetricsOps
      .topFrequentWords(Tables.documents(spark, dir), "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    val windowIdx = plan.indexOf("Window")
    val takeIdx = plan.indexOf("TakeOrderedAndProject")
    assert(windowIdx < takeIdx, "Window must sit ABOVE the n-row take")
  }

  test("exact-fingerprint dedup is a single-shuffle partial aggregate") {
    val plan = SparkEntry.queries("dedup_exact_fp")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, "partial + final agg")
    assert("Exchange".r.findAllIn(plan).size === 1, "exactly one shuffle")
  }

  test("train_assembly: two shuffles, per-row signals tokenized once") {
    val plan = operators.AssemblyOps.trainAssembly(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 2,
      "dedup window + final aggregate only")
    // regression pin for the staged-signal fix: norm appears once as a
    // column plus once inside the toks column — NOT once per signal use
    // (the inlined form evaluated the tokenize ~20x per row, 76 s vs 1.6 s
    // at sf0.1)
    val tokenizes = "trim\\(regexp_replace\\(lower\\(".r.findAllIn(plan).size
    assert(tokenizes <= 3, s"tokenize inlined $tokenizes times")
  }

  test("near-dup candidate joins are equi-joins on band keys, never cartesian") {
    // every dedup detector's candidate stage must plan as a hash/sort-merge
    // equi-join on the fixed-width (band, hash) keys — a BroadcastNestedLoop
    // or Cartesian here would be the O(n²) plan the blocking exists to avoid
    val docs = Tables.documents(spark, dir)
    Seq(
      operators.DedupOps.minhashPairs(docs, "doc_id", "text", 0.5),
      operators.DedupOps.simhashPairs(docs, "doc_id", "text", 3),
      operators.DedupOps.simhashClusters(docs, "doc_id", "text"),
      operators.DedupOps.incrementalDupCheck(
        operators.DedupOps.minhashIndex(
          docs.filter(col("doc_id") < 400), "doc_id", "text"),
        docs.filter(col("doc_id") >= 400), "doc_id", "text"),
      operators.SimilarityOps.lshDupPairs(spark, dir),
      operators.SimilarityOps.lshAnn(spark, dir)
    ).foreach { q =>
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    }
    graft.Caching.releaseAll()
  }

  test("bucketed tables co-locate the fact join: zero shuffle exchanges") {
    // the repeated-join posture for 100 TB fact↔fact joins (DEPLOY.md):
    // bucketBy the join key at write time, pay the shuffle once, and every
    // later join on that key is exchange-free
    val wh = Files.createTempDirectory("graft-bucket").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, dir)
        .select("o_orderkey", "o_totalprice").write
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders").saveAsTable("bkt_orders")
      Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey")).agg(sum("l_quantity").as("qty")).write
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lines").saveAsTable("bkt_lines")
      val joined = spark.table("bkt_orders").join(spark.table("bkt_lines"),
        col("o_orderkey") === col("l_orderkey"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lines")
    }
  }
}
