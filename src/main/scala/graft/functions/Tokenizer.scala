package graft.functions

import org.apache.spark.sql.Column

/** F4 — the morphological-analyzer seam.
  *
  * The reference lazily resolves the best available Korean analyzer at
  * startup — KiwiPy → SoyNLP → KoNLPy Okt → simple regex tokenization
  * (/root/reference/preprocessing.py:40-69) — and every caller consumes
  * whichever landed. This trait is that seam as a column-level contract:
  * implementations must produce an array-of-string Column and should stay
  * codegen-friendly (compositions of built-in expressions, no UDFs), so
  * swapping analyzers never changes the plan shape around them.
  *
  * The morphological analyzers themselves bind to native/Python libraries
  * absent from this environment, so the registry resolves their names to
  * None and the chain degrades to the same `simple` fallback the reference
  * ships. A real analyzer (JNI/ONNX-backed) plugs in via `register` without
  * touching any call site.
  */
trait Tokenizer {
  def name: String
  def tokenize(text: Column): Column
}

object Tokenizer {

  /** Whitespace tokens of the canonical normalization, lengths [2, 15] —
    * the reference's final fallback (preprocessing.py:266-277).
    */
  case object Simple extends Tokenizer {
    val name = "simple"
    def tokenize(text: Column): Column = TextFunctions.tokens(text)
  }

  /** Korean-run extraction — the regex noun-ish analyzer the simple mode
    * applies to Korean-only fields (preprocessing.py:266-277).
    */
  case object KoreanRuns extends Tokenizer {
    val name = "korean-runs"
    def tokenize(text: Column): Column = TextFunctions.koreanTokens(text)
  }

  /** Resolution order, best analyzer first (preprocessing.py:40-69). */
  val Chain: Seq[String] = Seq("kiwi", "soynlp", "konlpy", "simple")

  private val registry = scala.collection.concurrent.TrieMap[String, Tokenizer](
    Simple.name -> Simple, KoreanRuns.name -> KoreanRuns)

  /** Plug in an analyzer under its chain name (e.g. "kiwi"). */
  def register(t: Tokenizer): Unit = registry.put(t.name, t)

  /** Remove a registered analyzer (test isolation). */
  def unregister(name: String): Unit = registry.remove(name)

  def resolve(name: String): Option[Tokenizer] = registry.get(name)

  /** First resolvable analyzer in the chain — `simple` until a
    * morphological analyzer registers itself.
    */
  def default: Tokenizer =
    Chain.iterator.flatMap(resolve(_).iterator).nextOption().getOrElse(Simple)
}
