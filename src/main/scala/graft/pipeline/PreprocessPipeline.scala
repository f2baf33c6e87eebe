package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DocPrep
import graft.functions.TextFunctions._

/** EP1 parity: the reference's preprocessing stage as a reusable pipeline
  * (/root/reference/preprocessing.py:293-359; SURVEY.md §3 EP1).
  *
  * Two hard-coded source schemas normalize to the canonical interchange
  * schema `(date, title, contents, title_contents, year, month,
  * cleaned_text)` (SURVEY.md §1.3, verified against the reference's
  * Results/pre_dataframe.xlsx):
  *   - "bigkinds"-style: 일자 / 제목 / 본문       (preprocessing.py:323-330)
  *   - "crawl"-style:   시작 날짜 / 제목 / 정제데이터 (preprocessing.py:332-339)
  *
  * Dates cast with null-on-error (pandas errors='coerce' ≡ try_to_timestamp
  * under Spark 4's default ANSI mode), dedup keeps the FIRST row in ingest order, and missing columns
  * fail with the reference's "column listing" diagnostic.
  */
object PreprocessPipeline {

  /** Reference-style schema assertion: fail fast, list what IS there
    * (LDA_Analysis.py:122-126 behavior).
    */
  def requireColumns(df: DataFrame, required: Seq[String]): Unit = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"missing column(s) ${missing.mkString(", ")}; " +
        s"available columns: ${df.columns.mkString(", ")}")
  }

  /** Stable ingest-order id for keep-first dedup (pandas index analogue). */
  def withIngestOrder(df: DataFrame): DataFrame =
    df.withColumn("__ord", monotonically_increasing_id())

  /** 일자/제목/본문 → canonical (date, title, contents). */
  def normalizeBigkinds(df: DataFrame): DataFrame = {
    requireColumns(df, Seq("일자", "제목", "본문"))
    df.select(
      try_to_timestamp(col("일자").cast("string")).as("date"), // null on parse error
      col("제목").cast("string").as("title"),
      col("본문").cast("string").as("contents"),
      col("__ord"))
  }

  /** 시작 날짜/제목/정제데이터 → canonical (date, title, contents). */
  def normalizeCrawl(df: DataFrame): DataFrame = {
    requireColumns(df, Seq("시작 날짜", "제목", "정제데이터"))
    df.select(
      try_to_timestamp(col("시작 날짜").cast("string")).as("date"),
      col("제목").cast("string").as("title"),
      col("정제데이터").cast("string").as("contents"),
      col("__ord"))
  }

  /** Common tail (preprocessing.py:341-359): keep-first dedup on contents,
    * drop null contents then null dates, derive title_contents / year /
    * month / cleaned_text.
    */
  def commonPreprocessing(canonical: DataFrame): DataFrame =
    DocPrep.dedupKeepFirst(canonical, "contents", "__ord")
      .filter(col("contents").isNotNull)
      .filter(col("date").isNotNull)
      .withColumn("title_contents",
        trim(concat_ws(" ",
          coalesce(col("title"), lit("")), coalesce(col("contents"), lit("")))))
      .withColumn("year", year(col("date")))
      .withColumn("month", month(col("date")))
      // clean FIRST, then normalize — the reference strips specials and
      // collapses whitespace before normalize_ai (preprocessing.py:206-217),
      // so punctuated forms like "A.I." clean to "AI" and then normalize to
      // 인공지능.
      .withColumn("cleaned_text", normalizeAi(cleanText(col("title_contents"))))
      .drop("__ord")

  /** Full EP1 pipeline for a crawl-schema source. */
  def prepareCrawl(raw: DataFrame): DataFrame =
    commonPreprocessing(normalizeCrawl(withIngestOrder(raw)))

  /** Full EP1 pipeline for a bigkinds-schema source. */
  def prepareBigkinds(raw: DataFrame): DataFrame =
    commonPreprocessing(normalizeBigkinds(withIngestOrder(raw)))

  /** S3 — stopword file: one word per line, blanks dropped, returned sorted
    * (the reference sorts for its report, preprocessing.py:149).
    */
  def loadStopwords(spark: SparkSession, path: String): Seq[String] = {
    import spark.implicits._
    spark.read.textFile(path)
      .map(_.trim).filter(_.nonEmpty)
      .distinct().collect().sorted.toSeq
  }

  /** S2/S4 — CSV source/sink with explicit UTF-8 + header (the reference's
    * pandas read_csv/to_csv surface, BERTopic_Analysis.py:137-138).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true").option("encoding", "UTF-8")
      .option("multiLine", "true").option("escape", "\"")
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true").option("encoding", "UTF-8")
      .option("escape", "\"")
      .csv(path)

  /** Query: documents → CSV → back (header + UTF-8 + multiLine + quote
    * escaping — the S2/S4 surface above) → per-lang totals, the
    * text-format sibling of the ORC face: CSV reads land as strings,
    * so the face also pins that the cast-back loses nothing.
    */
  def csvRoundtripQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, dir)
    val out = s"${spark.conf.get("spark.sql.warehouse.dir")}/graft_csv_roundtrip"
    writeCsv(docs, out)
    readCsv(spark, out)
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
      .groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy(col("lang"))
  }
}
