package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.AnalysisMain

/** EP3 CLI contract (LDA_Analysis.py:731-876): flag parsing with the
  * reference's short forms, and the 2..50 topic-count loop.
  */
class AnalysisMainSpec extends AnyFunSuite {

  test("parseArgs handles long and short flags") {
    val opts = AnalysisMain.parseArgs(
      Array("--data", "/tmp/d", "-t", "7", "-c", "cleaned_text"))
    assert(opts === Map("data" -> "/tmp/d", "topics" -> "7", "column" -> "cleaned_text"))
  }

  test("parseArgs rejects a dangling flag") {
    intercept[IllegalArgumentException] {
      AnalysisMain.parseArgs(Array("--topics"))
    }
  }

  test("valid explicit topic count wins without prompting") {
    assert(AnalysisMain.resolveTopics(Some(5), None) === 5)
    assert(AnalysisMain.resolveTopics(Some(2), None) === 2)
    assert(AnalysisMain.resolveTopics(Some(50), None) === 50)
  }

  test("out-of-bounds topic count re-prompts until valid (reference input loop)") {
    val answers = Iterator("abc", "99", "1", "7")
    val k = AnalysisMain.resolveTopics(Some(51), Some(() => answers.next()))
    assert(k === 7)
  }

  test("missing topic count prompts when interactive") {
    val k = AnalysisMain.resolveTopics(None, Some(() => "3"))
    assert(k === 3)
  }

  test("non-interactive out-of-bounds fails fast with the bounds message") {
    val e = intercept[IllegalArgumentException] {
      AnalysisMain.resolveTopics(Some(0), None)
    }
    assert(e.getMessage.contains("[2, 50]"))
    intercept[IllegalArgumentException] {
      AnalysisMain.resolveTopics(None, None)
    }
  }
}
