package graft.pipeline

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stopword management parity (the reference's `StopwordsManager`,
  * /root/reference/preprocessing.py:71-176): a file-backed stopword set
  * that creates the default Korean list on first use, persists every
  * add/remove sorted back to the file, answers exact membership, and
  * exposes the DataFrame view the reports consume
  * (preprocessing.py:149 `get_stopwords_dataframe`).
  *
  * The SET is driver-side (it is a lexicon, thousands of entries at most);
  * filtering corpora with it stays distributed via
  * `TextFunctions.removeStopwords{,Substring}` over a broadcast literal.
  */
class Stopwords(path: String) {

  private var words: Set[String] = loadOrCreate()

  private def loadOrCreate(): Set[String] = {
    val p = Paths.get(path)
    if (Files.exists(p))
      Files.readAllLines(p).asScala.map(_.trim).filter(_.nonEmpty).toSet
    else {
      words = Stopwords.DefaultKorean.toSet
      save(words)
      words
    }
  }

  private def save(ws: Set[String]): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, ws.toSeq.sorted.mkString("", "\n", "\n"))
  }

  def contains(w: String): Boolean = words.contains(w.trim)

  def add(w: String): Unit = {
    words += w.trim
    save(words)
  }

  def remove(w: String): Unit = {
    words -= w.trim
    save(words)
  }

  /** Sorted view (the reference sorts for reports and file writes). */
  def all: Seq[String] = words.toSeq.sorted

  /** Report-sheet view: one `word` column, sorted. */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    all.toDF("word")
  }
}

object Stopwords {

  /** The reference's default Korean stopword lexicon
    * (preprocessing.py:96-146) — demonstratives, endings/particles,
    * connectives, bound nouns, quantity/time expressions, generic nouns,
    * evaluative predicates.
    */
  val DefaultKorean: Seq[String] = Seq(
    "이것", "그것", "저것", "이런", "그런", "저런", "이렇게", "그렇게", "저렇게",
    "여기", "거기", "저기", "이곳", "그곳", "저곳",
    "입니다", "습니다", "있습니다", "없습니다", "했습니다", "됩니다", "합니다",
    "이다", "하다", "되다", "있다", "없다", "같다", "다른", "많다", "적다",
    "그리고", "하지만", "그러나", "또한", "따라서", "그래서", "그런데", "그러면",
    "만약", "비록", "심지어", "특히", "예를 들어", "즉", "한편",
    "때문", "위해", "통해", "대해", "에서", "에게", "에게서", "으로", "로서",
    "부터", "까지", "마다", "보다", "처럼", "같이", "함께", "대신",
    "것은", "것이", "것을", "것의", "것도", "것만", "것까지", "것부터",
    "때는", "때가", "때를", "곳은", "곳이", "곳을", "점은", "점이", "점을",
    "하나", "둘", "셋", "매우", "정말", "너무", "아주", "꽤", "상당히",
    "조금", "약간", "거의", "완전히", "전혀", "별로",
    "오늘", "어제", "내일", "지금", "나중", "이전", "이후", "동안", "사이",
    "요즘", "최근", "과거", "미래", "현재",
    "사람", "경우", "문제", "상황", "방법", "결과", "이유", "목적",
    "과정", "단계", "부분", "전체", "내용", "정보", "자료", "데이터",
    "좋다", "나쁘다", "괜찮다", "어렵다", "쉽다", "중요하다", "필요하다",
    "가능하다", "불가능하다", "확실하다", "애매하다",
    "우리", "저희", "제가", "당신", "여러분", "모든", "각각", "서로",
    "자신", "스스로", "직접", "간접", "반드시", "절대", "가끔", "종종").distinct
}
