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
  * (Bench, Verify, AnalysisRunner callers) call `releaseAll()` AFTER
  * materializing each query's result. Long-lived cross-query caches (the
  * fitted-model registry in TopicModelOps) intentionally do NOT go through
  * this registry.
  */
object Caching {

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and register it for the next releaseAll(). */
  def track(df: DataFrame): DataFrame = synchronized {
    df.persist()
    tracked += df
    df
  }

  /** Register an already-persisted frame for the next releaseAll(). */
  def register(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df
  }

  /** Unpersist every tracked frame (non-blocking) and clear the registry. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }

  /** Number of currently tracked frames (spec surface). */
  def trackedCount: Int = synchronized(tracked.size)
}
