package graft

import org.apache.spark.sql.DataFrame

/** Tracked per-query persist registry.
  *
  * Operators persist intermediates that feed several consumers inside ONE
  * query (LSH signature tables, term-frequency scans, presence sets). Those
  * caches are dead the moment the query's sink materializes, but a bare
  * `.persist()` has no owner who can safely release it — so in a long-lived
  * session (the 64-query Bench/Verify runs, or a warehouse service) executor
  * storage grows monotonically.
  *
  * Contract: operators register query-scoped caches via `track`; harnesses
  * (Bench, Verify, AnalysisRunner callers) wrap each query in `scoped { … }`
  * — frames tracked on the calling thread inside the block are unpersisted
  * when the block exits, so one query's release can never evict another
  * in-flight query's caches in a concurrent service. Frames tracked from
  * OTHER threads spawned inside a scope (e.g. the grid-search driver
  * futures) fall back to the process-global scope; sequential harnesses
  * drain that with `releaseAll()` after each query. Long-lived cross-query
  * caches (the fitted-model registry in TopicModelOps) intentionally do NOT
  * go through this registry.
  */
object Caching {

  private final class Scope {
    val releases = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    def add(r: () => Unit): Unit = synchronized { releases += r }
    def release(): Unit = synchronized {
      releases.foreach(r => r())
      releases.clear()
    }
    def size: Int = synchronized(releases.size)
  }

  private val global = new Scope
  // DynamicVariable = per-thread scope stack; threads the pool created before
  // a scope opened (shared ExecutionContext workers) resolve to `global`.
  private val current = new scala.util.DynamicVariable[Scope](global)

  /** Persist `df` and register it with the active scope. */
  def track(df: DataFrame): DataFrame = {
    df.persist()
    current.value.add(() => df.unpersist(false))
    df
  }

  /** Register an already-persisted frame with the active scope. */
  def register(df: DataFrame): DataFrame = {
    current.value.add(() => df.unpersist(false))
    df
  }

  /** Register an already-persisted bare RDD with the active scope — for
    * frames whose storage lives outside the SQL cache manager (the
    * lineage-broken label rounds in DedupOps.propagateLabelsTracked).
    */
  def registerRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit =
    current.value.add(() => { rdd.unpersist(false); () })

  /** Run `body` in a fresh cache scope; everything tracked on this thread
    * inside it is unpersisted (non-blocking) when the block exits.
    */
  def scoped[T](body: => T): T = {
    val s = new Scope
    try current.withValue(s)(body)
    finally s.release()
  }

  /** Unpersist every frame in the process-global scope — the catch-all for
    * frames tracked outside any `scoped` block (or from pre-existing pool
    * threads inside one). Sequential harnesses call this between queries.
    */
  def releaseAll(): Unit = global.release()

  /** Frames currently tracked in the active scope (spec surface). */
  def trackedCount: Int = current.value.size

  /** Atomic fit-registry lookup: lock-free on hits, the build serialized
    * per registry map. `TrieMap.getOrElseUpdate` evaluates its by-name
    * builder non-atomically — two concurrent first calls both run the
    * (expensive) fit and both persist, and the losing frame's storage
    * leaks until JVM exit because only the cached winner is unpersisted
    * at teardown. Every cross-query registry (NLL scores, media corpus,
    * dedup labels, postings, BPE merges, …) routes through here.
    *
    * Bounded by construction: each registry map holds at most
    * `RegistryMaxEntries` corpora — inserting past the cap evicts the
    * OLDEST entry (FIFO by build order) and unpersists its storage if the
    * value is a DataFrame. A bounded harness session never reaches the
    * cap (one or two corpora per run); the cap is the ceiling that keeps
    * a long-lived SERVICE cycling many corpus versions from accumulating
    * unbounded executor storage between explicit clears (spec-pinned in
    * CachingSpec).
    */
  val RegistryMaxEntries = 8

  // per-registry insertion order, keyed by map identity (registries are
  // static singletons, so this map never grows past the registry count)
  private val insertionOrder = new java.util.IdentityHashMap[
    AnyRef, scala.collection.mutable.ArrayDeque[String]]

  def registryGet[V](map: scala.collection.concurrent.TrieMap[String, V],
                     key: String)(build: => V): V =
    map.get(key).getOrElse(map.synchronized {
      val v = map.getOrElseUpdate(key, {
        val built = build
        val order = insertionOrder.synchronized {
          var q = insertionOrder.get(map)
          if (q == null) {
            q = scala.collection.mutable.ArrayDeque.empty[String]
            insertionOrder.put(map, q)
          }
          q
        }
        // drop stale occurrences (a key rebuilt after an explicit clear)
        // so FIFO eviction can't strike a live re-added entry early
        order.filterInPlace(_ != key)
        order += key
        while (order.size > RegistryMaxEntries) {
          val victim = order.removeHead()
          map.remove(victim).foreach {
            case df: DataFrame => df.unpersist(false)
            case p: Product => p.productIterator.foreach {
              case df: DataFrame => df.unpersist(false)
              case _ => ()
            }
            case _ => ()
          }
        }
        built
      })
      v
    })
}
