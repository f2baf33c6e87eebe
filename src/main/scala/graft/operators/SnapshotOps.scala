package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus snapshot diff — the audit between two versions of a corpus: which
  * documents were ADDED, REMOVED, CHANGED (same id, different content), or
  * carried UNCHANGED. Every recurring ingest needs this before it trusts a
  * refresh (the reference re-runs its whole pandas pipeline per file and
  * has no between-run story, /root/reference/preprocessing.py:117-131;
  * at corpus scale "what changed since the last snapshot" IS the pipeline
  * trigger — retrain, re-embed, and re-index decisions all key off it).
  *
  * Scale shape: each side reduces to (id, fingerprint) — the same seed-7
  * rolling hash the exact-dedup tier uses, so "changed" means changed
  * CONTENT, not changed bytes-of-formatting — then ONE full-outer join on
  * the id classifies every row. Fixed-width join keys, no text moves
  * through the shuffle; on a warehouse where both snapshots are id-bucketed
  * tables the join runs with zero exchanges (LayoutOps). Output is
  * row-per-id, aggregated by the caller to whatever report shape it needs.
  */
object SnapshotOps {

  /** Classify ids across two (id, fp) snapshot frames. Returns (id, status)
    * with status ∈ added | removed | changed | unchanged.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
                   fpCol: String = "fp"): DataFrame = {
    val o = oldSnap.select(col(idCol), col(fpCol).as("fp_old"))
    val n = newSnap.select(col(idCol), col(fpCol).as("fp_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Query: the snapshot audit over the documents fixture. The fixture
    * ships one version, so the "previous" snapshot is derived
    * DETERMINISTICALLY from it — ids ≡ 0 (mod 97) carried stale text
    * (→ changed), the current version drops ids ≡ 0 (mod 101)
    * (→ removed), and the previous version lacks the last id decile
    * (→ added; same metadata-boundary cut as `dedup_incremental`) — so
    * all four statuses are pinned on non-zero counts. Reported per
    * (status, lang) with id bounds: bounded output at any corpus size.
    */
  def snapshotDiffQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(floor(max(col("doc_id")) * 0.9).cast("long"))
      .collect()(0).getLong(0)
    val old = docs.filter(col("doc_id") <= cut)
      .withColumn("text", when(col("doc_id") % 97 === 0,
        concat(col("text"), lit(" stale edition"))).otherwise(col("text")))
    val neu = docs.filter(col("doc_id") % 101 =!= 0)
    val fp = (d: DataFrame) => graft.streaming.StreamOps
      .withFingerprint(d, "text").select(col("doc_id"), col("fp"))
    snapshotDiff(fp(old), fp(neu), "doc_id")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("status"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy(col("status"), col("lang"))
  }
}
