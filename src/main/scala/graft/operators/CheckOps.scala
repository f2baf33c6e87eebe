package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-quality constraints — the admission gate a corpus
  * passes before training jobs trust it. Each rule states an expectation
  * (non-null, membership, range, pattern, key uniqueness); `check` returns
  * one row per rule with exact violation counts, so the report is itself a
  * small queryable frame (alert on it, trend it, block the pipeline on
  * `passed = 0`).
  *
  * The reference validates inputs imperatively — column-existence asserts
  * and ad-hoc dropna counts before every analysis
  * (/root/reference/LDA_Analysis.py:122-126,
  * /root/reference/preprocessing.py:195-210); this is that discipline as a
  * reusable operator with the counts under oracle instead of print
  * statements.
  *
  * Scale shape: every ROW-WISE rule folds into ONE aggregate over one scan
  * (conditional sums, map-side combined) regardless of rule count; the
  * single-row result explodes to rule rows via one in-plan array-of-structs
  * explode — never a re-scan per rule. `Unique` rules need a distinct
  * count, which is its own
  * two-phase aggregate; each distinct column adds an expand copy of the
  * scan, so key-uniqueness checks are priced per column, not free.
  */
object CheckOps {

  sealed trait Rule {
    def ruleName: String
    def colName: String
  }
  /** Column must be non-null. */
  final case class NotNull(colName: String) extends Rule {
    val ruleName = "not_null"
  }
  /** Column must be one of `values` (nulls violate). */
  final case class InSet(colName: String, values: Seq[String]) extends Rule {
    val ruleName = "in_set"
  }
  /** lo ≤ value ≤ hi (nulls violate). */
  final case class InRange(colName: String, lo: Double, hi: Double) extends Rule {
    val ruleName = "in_range"
  }
  /** Column must match the regex (nulls violate). */
  final case class Matches(colName: String, regex: String) extends Rule {
    val ruleName = "matches"
  }
  /** Column must be a unique key: violations = rows − distinct values. */
  final case class Unique(colName: String) extends Rule {
    val ruleName = "unique"
  }
  /** Vector column must have exactly `dim` elements (nulls violate) — the
    * guard against silent embedder/model drift changing dimensionality
    * mid-corpus.
    */
  final case class VecDim(colName: String, dim: Int) extends Rule {
    val ruleName = "vec_dim"
  }
  /** Every vector element must be a finite number: null elements and NaNs
    * violate (a single NaN poisons every dot product it ever meets).
    */
  final case class VecFinite(colName: String) extends Rule {
    val ruleName = "vec_finite"
  }

  private def violates(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNull
    case InSet(c, vs) => col(c).isNull || !col(c).isin(vs: _*)
    case InRange(c, lo, hi) => col(c).isNull || col(c) < lo || col(c) > hi
    case Matches(c, re) => col(c).isNull || !col(c).rlike(re)
    case VecDim(c, d) => col(c).isNull || size(col(c)) =!= d
    case VecFinite(c) => col(c).isNull ||
      exists(col(c), v => v.isNull || isnan(v))
    case _: Unique =>
      throw new IllegalArgumentException("Unique is not row-wise")
  }

  /** The report-row explode, as typed Columns: one array-of-structs literal
    * over the 1-row aggregate, so every rule row comes out of ONE scan
    * (the same in-plan shape as `stack`) — but rule/column names travel as
    * `lit` values, never spliced into SQL text, so a name carrying a
    * quote, backtick, or comma cannot break or inject into the plan.
    */
  private def ruleRows(entries: Seq[(Rule, String)]): Column =
    array(entries.map { case (r, v) =>
      struct(lit(r.ruleName).as("rule"), lit(r.colName).as("col_name"),
        col(v).as("n_violations"))
    }: _*)

  /** Run all rules; returns (rule, col_name, n_checked, n_violations,
    * passed) — passed as 0/1 so the frame stays engine-portable.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val (uniques, rowwise) = rules.partition(_.isInstanceOf[Unique])
    // One scan for every row-wise rule: count + k conditional sums.
    val aggs = count(lit(1)).cast("long").as("n_checked") +:
      rowwise.zipWithIndex.map { case (r, i) =>
        sum(when(violates(r), 1L).otherwise(0L)).as(s"v$i")
      } ++: uniques.zipWithIndex.map { case (r, i) =>
        (count(lit(1)) - countDistinct(col(r.colName))).cast("long").as(s"u$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = rowwise.zipWithIndex.map { case (r, i) => (r, s"v$i") } ++
      uniques.zipWithIndex.map { case (r, i) => (r, s"u$i") }
    one.select(col("n_checked"), explode(ruleRows(entries)).as("e"))
      .select(col("e.rule").as("rule"), col("e.col_name").as("col_name"),
        col("n_checked"), col("e.n_violations").as("n_violations"),
        (col("e.n_violations") === 0L).cast("int").as("passed"))
  }

  /** Query: the admission report for the documents fixture — key
    * uniqueness, required fields, a language whitelist that real fixture
    * rows DO violate (the corpus carries a sixth language, so the counting
    * path is pinned on non-zero numbers), a length band, and a source
    * pattern.
    */
  /** Row-wise rules, reported PER GROUP — the diagnosing face: a failing
    * whole-corpus gate says the corpus is bad, the grouped report says
    * WHICH source/shard/day brought the violations in. Same one-aggregate
    * shape, keyed on the group (|groups| × |rules| output rows). `Unique`
    * is not row-wise and has its own whole-frame semantics — use `check`.
    */
  def checkBy(df: DataFrame, groupCol: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    require(!rules.exists(_.isInstanceOf[Unique]),
      "Unique is whole-frame; use check()")
    val aggs = count(lit(1)).cast("long").as("n_checked") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(violates(r), 1L).otherwise(0L)).as(s"v$i")
      }
    val entries = rules.zipWithIndex.map { case (r, i) => (r, s"v$i") }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), col("n_checked"), explode(ruleRows(entries)).as("e"))
      .select(col(groupCol), col("e.rule").as("rule"),
        col("e.col_name").as("col_name"), col("n_checked"),
        col("e.n_violations").as("n_violations"),
        (col("e.n_violations") === 0L).cast("int").as("passed"))
  }

  /** Referential-integrity rule — the cross-TABLE constraint class: every
    * value of `colName` must exist in `dim.dimCol` (orphans and null keys
    * violate). Counted with a left-anti join against the dim side's
    * distinct keys: a dimension that fits the broadcast threshold never
    * shuffles the fact side; a larger one runs as an ordinary shuffled
    * anti join — the fact table is never collected either way. Returns the
    * same report row shape as `check`, so reports compose with
    * `unionByName` / `mergeReports` (anti-join counts sum across
    * fact-side shards against the same dimension).
    */
  def checkRef(df: DataFrame, colName: String, dim: DataFrame,
               dimCol: String, ruleName: String = "ref_integrity"): DataFrame = {
    val total = df.agg(count(lit(1)).cast("long").as("n_checked"))
    val orphans = df.select(col(colName))
      .join(dim.select(col(dimCol).as(colName)).distinct(),
        Seq(colName), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"))
    total.crossJoin(orphans)
      .select(lit(ruleName).as("rule"), lit(colName).as("col_name"),
        col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).cast("int").as("passed"))
  }

  /** Merge constraint reports (e.g. per-shard or per-day runs of the SAME
    * rule set): counts sum by (rule, col_name), `passed` re-derives — the
    * merged report equals one `check` over the concatenated data, so
    * history never needs rescanning. Not valid for `unique` rows —
    * distinct counts don't sum across shards (the same key can appear in
    * two shards, each locally unique) — so a report carrying one is
    * REJECTED loudly at plan time rather than merged into a wrong number;
    * run whole-frame `check` for uniqueness instead.
    */
  def mergeReports(reports: Seq[DataFrame]): DataFrame = {
    require(reports.nonEmpty, "no reports given")
    val merged = reports.reduce(_ unionByName _)
    val nUnique = merged.filter(col("rule") === Unique("x").ruleName).count()
    require(nUnique == 0L,
      s"mergeReports: $nUnique 'unique' rows in input reports — distinct " +
        "counts are not mergeable across shards; check uniqueness whole-frame")
    merged
      .groupBy(col("rule"), col("col_name"))
      .agg(sum(col("n_checked")).as("n_checked"),
        sum(col("n_violations")).as("n_violations"))
      .select(col("rule"), col("col_name"), col("n_checked"),
        col("n_violations"),
        (col("n_violations") === 0L).cast("int").as("passed"))
  }

  /** Query: the embedding-table admission gate — id uniqueness, fixed
    * dimensionality, element finiteness (NaN poisoning), and the label
    * range. The rules a similarity/dedup tier must hold before its indexes
    * mean anything.
    */
  def embeddingChecks(spark: SparkSession, dir: String): DataFrame =
    check(Tables.embeddings(spark, dir), Seq(
      Unique("vec_id"),
      NotNull("embedding"),
      VecDim("embedding", 64),
      VecFinite("embedding"),
      InRange("label", 0, 9)))
      .orderBy(col("rule"), col("col_name"))

  /** Query: the cross-table admission gate over the relational fixtures —
    * the three real foreign keys (all hold) plus a population-membership
    * check (events must come from BUILDING-segment customers — they
    * don't all, pinning the non-zero orphan path).
    */
  def refIntegrityChecks(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val events = Tables.events(spark, dir)
    Seq(
      checkRef(orders, "o_custkey", customer, "c_custkey"),
      checkRef(lineitem, "l_orderkey", orders, "o_orderkey"),
      checkRef(events, "user_id", customer, "c_custkey"),
      checkRef(events, "user_id",
        customer.filter(col("c_mktsegment") === "BUILDING"), "c_custkey",
        ruleName = "in_population"))
      .reduce(_ unionByName _)
      .orderBy(col("rule"), col("col_name"))
  }

  /** Query: the per-source diagnosis — the same document rules sliced by
    * origin, so a violation spike names the shard that shipped it.
    */
  def documentChecksBySource(spark: SparkSession, dir: String): DataFrame =
    checkBy(Tables.documents(spark, dir), "source", Seq(
      NotNull("text"),
      InSet("lang", Seq("en", "ko", "de", "es", "fr")),
      InRange("n_chars", 30, 100000)))
      .orderBy(col("source"), col("rule"), col("col_name"))

  def documentChecks(spark: SparkSession, dir: String): DataFrame =
    check(Tables.documents(spark, dir), Seq(
      Unique("doc_id"),
      NotNull("text"),
      NotNull("lang"),
      InSet("lang", Seq("en", "ko", "de", "es", "fr")),
      InRange("n_chars", 30, 100000),
      Matches("source", "^[a-z0-9_.-]+$")))
      .orderBy(col("rule"), col("col_name"))
}
