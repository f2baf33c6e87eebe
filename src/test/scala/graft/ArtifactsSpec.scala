package graft

/** Contract of the model-artifact export seam (Artifacts.scala): disabled
  * by default (Bench/specs never pay the write), idempotent per enable
  * scope, and refs resolve only after the owning save ran.
  */
class ArtifactsSpec extends SparkSuite {
  import spark.implicits._

  test("disabled: save is a no-op and ref does not resolve") {
    Artifacts.disable()
    var evaluated = false
    Artifacts.save("never") { evaluated = true; Seq(1).toDF("x") }
    assert(!evaluated && !Artifacts.enabled)
    assert(Artifacts.ref("never").startsWith("artifact_not_materialized"))
  }

  test("enabled: writes once per scope, ref points at the parquet, re-enable resets") {
    val base = java.nio.file.Files.createTempDirectory("graft-artifacts").toString
    Artifacts.enable(base)
    try {
      var evals = 0
      Artifacts.save("t") { evals += 1; Seq((1L, "a"), (2L, "b")).toDF("id", "v") }
      Artifacts.save("t") { evals += 1; Seq((9L, "z")).toDF("id", "v") } // dup: skipped
      assert(evals === 1)
      assert(Artifacts.ref("t") === s"read_parquet('$base/t/*.parquet')")
      assert(spark.read.parquet(s"$base/t").count() === 2L)
      // a fresh enable() starts a new registry: the same name writes again
      Artifacts.enable(base)
      assert(Artifacts.ref("t").startsWith("artifact_not_materialized"))
      Artifacts.save("t")(Seq((9L, "z")).toDF("id", "v"))
      assert(spark.read.parquet(s"$base/t").count() === 1L)
    } finally Artifacts.disable()
  }

  test("storedIndex probes the PERSISTED index when enabled (build-once/probe-many)") {
    // both incremental faces (dedup_incremental, dedup_index_flags) route
    // through storedIndex; this pins that under Verify conditions the probe
    // side scans the artifact parquet — not the in-plan index — and that
    // the flags are identical either way
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-artifacts").toString
    val dir = SparkSpec.FixtureDir
    val docs = Tables.documents(spark, dir)
    Artifacts.enable(base)
    val (stored, cut) =
      try operators.DedupOps.storedIndex(spark, dir)
      finally Artifacts.disable()
    assert(stored.inputFiles.nonEmpty && stored.inputFiles.forall(_.contains(base)),
      s"probe reads ${stored.inputFiles.take(2).mkString(",")}, not the stored artifact")
    val buckets = (ix: org.apache.spark.sql.DataFrame) => ix
      .select(posexplode(col("bands")).as(Seq("band", "band_hash"))).distinct()
    val delta = docs.filter(col("doc_id") > cut)
    val viaStored = streaming.StreamOps
      .indexDupBatch(delta, buckets(stored), "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val inline = operators.DedupOps
      .minhashIndex(docs.filter(col("doc_id") <= cut), "doc_id", "text")
    val viaInline = streaming.StreamOps
      .indexDupBatch(delta, buckets(inline), "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(viaStored === viaInline && viaStored.nonEmpty)
  }

  test("storedGramIndex probes the PERSISTED span index when enabled") {
    // the substring tier's incremental face (dedup_span_flags) routes
    // through storedGramIndex — same build-once/probe-many pin as above
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-artifacts").toString
    val dir = SparkSpec.FixtureDir
    val docs = Tables.documents(spark, dir)
    Artifacts.enable(base)
    val (stored, cut) =
      try operators.SpanDedupOps.storedGramIndex(spark, dir)
      finally Artifacts.disable()
    assert(stored.inputFiles.nonEmpty && stored.inputFiles.forall(_.contains(base)),
      s"probe reads ${stored.inputFiles.take(2).mkString(",")}, not the stored artifact")
    val delta = docs.filter(col("doc_id") > cut)
    val viaStored = operators.SpanDedupOps
      .spanHitBatch(delta, stored, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val inline = operators.SpanDedupOps
      .spanGramIndex(docs.filter(col("doc_id") <= cut), "text")
    val viaInline = operators.SpanDedupOps
      .spanHitBatch(delta, inline, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(viaStored === viaInline && viaStored.nonEmpty)
  }
}
