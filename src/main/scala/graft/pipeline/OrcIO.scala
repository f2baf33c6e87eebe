package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the second columnar interchange format next to the
  * parquet primary (warehouses feeding a training pipeline commonly hand
  * over ORC from Hive-lineage systems). Reads take an EXPLICIT schema
  * like JsonlIO (no inference pass over a 100 TB directory); writes are
  * plain `DataFrameWriter.orc`, so partitioning/bucketing compose through
  * LayoutOps unchanged. The roundtrip face pins, against the
  * parquet-truth oracle, that the sink/source pair loses and corrupts
  * nothing — same contract as `src_jsonl_roundtrip`.
  */
object OrcIO {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Query: documents → ORC → back under the explicit schema → per-lang
    * totals with id-span pins. One warehouse-relative path, overwritten
    * per run (the JsonlIO rationale: the warehouse is the only
    * multi-node-shared location).
    */
  def roundtripQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val out = s"${spark.conf.get("spark.sql.warehouse.dir")}/graft_orc_roundtrip"
    writeOrc(docs, out)
    readOrc(spark, out, docs.schema)
      .groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy(col("lang"))
  }
}
