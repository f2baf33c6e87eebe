package graft

import org.apache.spark.sql.DataFrame

/** Model-artifact export seam for the correctness gate.
  *
  * The iterative fits (LDA, KMeans, Word2Vec, the IVF quantizer) are not
  * SQL-expressible, but everything downstream of them — assignment joins,
  * the mean+2σ noise rule, centroid cosines, probe rankings — is plain
  * relational work. Persisting each seeded fit's artifacts as parquet lets
  * the DuckDB oracle re-derive that downstream independently and
  * hash-compare it, shrinking the rows-only surface to the fits alone
  * (reference consumers: /root/reference/LDA_Analysis.py:433-469,
  * /root/reference/BERTopic_Analysis.py:539-665).
  *
  * Lifecycle: `Verify` enables exports into a sibling of its output dir
  * before running any query; each fit helper calls `save` as it
  * materializes; `SparkEntry.oracleSql` (evaluated AFTER the query loop)
  * embeds `ref(...)` paths into the oracle SQL it dumps. Outside Verify
  * (Bench, specs, CLI mains) exports are disabled and `save` is a no-op —
  * the hot path never pays the write.
  */
object Artifacts {

  @volatile private var baseOpt: Option[String] = None
  private val written = scala.collection.concurrent.TrieMap.empty[String, String]
  Caching.nameRegistry(written, "artifacts.written")

  // Corpus-flavor namespace: `save` is first-write-wins per name, so two
  // queries running the SAME operator against DIFFERENT corpora (the
  // realistic-twin faces vs the base fixtures) would otherwise collide —
  // whichever ran first would pin the artifact and every later consumer
  // (e.g. storedIndex's probe-many read-back) would silently probe the
  // WRONG corpus' index (found r15: the base ingest gate's dup flags
  // changed when a _real face ran earlier in the same Verify JVM).
  private val ns = new scala.util.DynamicVariable[String]("")

  /** Run `body` with artifact names prefixed `<prefix>/` — the realistic
    * faces' writes and read-backs stay in their own directory and can
    * never shadow a base face's artifact (or vice versa).
    */
  def namespaced[T](prefix: String)(body: => T): T =
    ns.withValue(prefix + "/")(body)

  private def full(name: String): String = ns.value + name

  /** The active corpus-flavor namespace ("" outside `namespaced`) — lets
    * per-corpus knob registries (SimilarityOps.dedupBits) key by flavor so
    * a realistic face's corpus-scaled parameters can't clobber the base
    * face's in the late-bound oracle dump.
    */
  def currentNamespace: String = ns.value

  /** Cache-key tag for registries whose VALUE depends on the artifact
    * context (storedIndex returns the artifact-parquet read-back when
    * exports are on, the in-plan frame when off — memoizing one across
    * contexts would serve the wrong shape).
    */
  def contextTag: String = baseOpt match {
    case Some(base) => s"export:$base/${ns.value}"
    case None => "mem"
  }

  /** Route subsequent `save` calls to `<base>/<name>` (fresh registry). */
  def enable(base: String): Unit = {
    written.clear()
    baseOpt = Some(base)
  }

  def disable(): Unit = {
    baseOpt = None
    written.clear()
  }

  def enabled: Boolean = baseOpt.isDefined

  /** Write `df` once per enable() scope (idempotent across the queries that
    * share a fit); no-op when disabled. The frame is tiny (fit-sized, not
    * corpus-sized) so a single-file write keeps the oracle read trivial.
    * Routed through the registryGet latch (r17): TrieMap.getOrElseUpdate
    * evaluates its builder non-atomically, so two concurrent first saves of
    * one name would BOTH run the parquet write — racing overwrites of the
    * same path. Sequential harnesses never hit this; a parallel Verify will.
    */
  def save(name: String)(df: => DataFrame): Unit = baseOpt.foreach { base =>
    Caching.registryGet(written, full(name), cap = Int.MaxValue) {
      val path = s"$base/${full(name)}"
      df.coalesce(1).write.mode("overwrite").parquet(path)
      path
    }
    ()
  }

  /** Filesystem path of a saved artifact, for queries that read their own
    * persisted table back (build-once/probe-many index shapes). None when
    * disabled or not yet materialized.
    */
  def path(name: String): Option[String] = written.get(full(name))

  /** DuckDB table expression for a saved artifact. Only resolves after the
    * owning query ran (Verify dumps oracle SQL after the query loop); an
    * unresolved ref yields SQL that fails loudly instead of silently
    * comparing against the wrong table. Routed through `full(name)` like
    * save/path so a ref evaluated inside a `namespaced` scope resolves the
    * same artifact the scope's save wrote (all three accessors share the
    * namespace logic; Verify's oracle dump runs in the root namespace, so
    * base-face refs are unchanged).
    */
  def ref(name: String): String =
    written.get(full(name))
      .map(path => s"read_parquet('$path/*.parquet')")
      .getOrElse(s"artifact_not_materialized_${full(name)}")
}
