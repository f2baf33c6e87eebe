package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (one JSON object per line) source + sink — the interchange format
  * large text corpora actually ship in (one doc per line, gz-splittable per
  * file). The reference exchanges frames as xlsx/csv only; at corpus scale
  * the same role is played by JSONL, so the engine carries it as a
  * first-class source next to S1/S2.
  *
  * Scale posture:
  *   - Reads take an EXPLICIT schema — schema inference is a second full
  *     pass over 100 TB before the first real one, and a drifted field
  *     would silently widen types mid-corpus. (The fixture loaders apply
  *     the same discipline via `Tables`' contract.)
  *   - Malformed lines are QUARANTINED, not dropped: the parse routes
  *     through `from_json` with a corrupt-record column, so bad input
  *     stays auditable (count it, sample it, re-ingest it) while the good
  *     side proceeds. Curation pipelines treat "how much did we drop and
  *     why" as a deliverable, not a log line.
  *   - Everything is codegen'd (`from_json` on a text scan); no UDFs, and
  *     parsing only materializes the fields the schema names.
  */
object JsonlIO {

  /** Name of the quarantine column carrying the raw unparseable line. */
  val Corrupt = "_corrupt"

  /** Write one JSON object per line (optionally compressed — gzip splits
    * per FILE, so at scale prefer many files over one large archive; the
    * upstream partitioning controls that).
    */
  def writeJsonl(df: DataFrame, path: String,
                 compression: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** Read JSONL under an explicit schema. Returns the parsed columns plus
    * `_corrupt` (the raw line, non-null exactly when the line failed to
    * parse as an object of `schema`).
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(Corrupt),
      s"schema already has a '$Corrupt' column")
    val withCorrupt = schema.add(Corrupt, StringType)
    spark.read.text(path)
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> Corrupt)).as("r"))
      .select(col("r.*"))
  }

  /** Read JSONL split into (good rows under `schema`, quarantined raw
    * lines). Both frames share one scan when consumed in the same job.
    */
  def readSplit(spark: SparkSession, path: String,
                schema: StructType): (DataFrame, DataFrame) = {
    val parsed = readJsonl(spark, path, schema)
    (parsed.filter(col(Corrupt).isNull).drop(Corrupt),
      parsed.filter(col(Corrupt).isNotNull).select(col(Corrupt).as("line")))
  }

  /** Query: documents → JSONL → back under the explicit schema → per-lang
    * totals, plus the quarantine count (0 on a clean roundtrip — the
    * oracle pins that the sink/source pair loses and corrupts nothing).
    */
  def roundtripQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    // One warehouse-relative path, overwritten per run: repeated
    // Verify/Bench invocations reuse it instead of leaking a fresh
    // driver-local temp corpus each call — and the warehouse dir is the
    // location that is actually SHARED on a multi-node cluster, where a
    // java.nio temp path would land on each node's private filesystem.
    val out = s"${spark.conf.get("spark.sql.warehouse.dir")}/graft_jsonl_roundtrip"
    writeJsonl(docs, out)
    val (good, bad) = readSplit(spark, out, docs.schema)
    val nBad = bad.agg(count(lit(1)).as("n_quarantined"))
    good.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).cast("long").as("sum_chars"))
      .crossJoin(broadcast(nBad))
      .orderBy(col("lang"))
  }
}
