package graft

import graft.pipeline.{ExcelIO, PreprocessPipeline}

/** Golden end-to-end parity against the reference repo's own COMMITTED
  * artifacts (SURVEY.md §5.3): the engine, fed the reference's real input
  * files, must reproduce the row counts of the outputs the reference
  * checked in. These pins are tokenizer-independent (dedup + null-drop +
  * distinct only), so they hold despite the sanctioned morphological
  * analyzer divergence.
  */
class GoldenSpec extends SparkSuite {

  private val RawXlsx =
    "/root/reference/RAW_DATA/2025_6_28_22_56_49_4600_channel_download_ai광고.xlsx"

  test("EP1 on the real crawl workbook reproduces pre_dataframe.xlsx exactly: 5058 -> 4793 rows") {
    // the reference's committed Results/pre_dataframe.xlsx holds 4,793 data
    // rows derived from the 5,058-row crawl (FIXTURES.md §1.1/§2,
    // preprocessing.py:344-350 keep-first dedup + null drops)
    val raw = ExcelIO.readXlsx(spark, RawXlsx)
    assert(raw.count() === 5058L)
    val prepped = PreprocessPipeline.prepareCrawl(raw)
    assert(prepped.count() === 4793L)
    // derived columns present and populated like the committed artifact
    assert(Seq("date", "title", "contents", "title_contents", "year",
      "month", "cleaned_text").forall(prepped.columns.contains))
    assert(prepped.filter(prepped("cleaned_text").isNull).count() === 0L)
  }

  test("stopword manager reproduces stopwords_list.xlsx exactly: 1104 distinct entries") {
    // the reference commits Results/stopwords_list.xlsx with 1,104 rows —
    // the distinct non-blank lines of its 1,381-line stopwords.txt
    val words = PreprocessPipeline.loadStopwords(spark,
      "/root/reference/stopwords.txt")
    assert(words.length === 1104)
    assert(words === words.sorted, "reference sorts its stopword report")
  }
}
