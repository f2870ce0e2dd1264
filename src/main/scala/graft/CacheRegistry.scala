package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry for persisted handles whose owner finishes
  * before the cache should die — e.g. semDeDup's assignment cache
  * (three consumers inside one query, worthless after it) or st7's
  * final label snapshot (outlives its builder loop, consumed once by
  * the caller). Operators register the handle instead of leaking it;
  * the between-queries reset (`TextQ.resetMaterializations`) drains the
  * registry so a long session (Bench/Run over the whole catalog) never
  * accumulates one pinned relation per invocation. Draining only
  * unpersists — lineage stays intact, so a late re-read recomputes
  * rather than breaking.
  *
  * Keyed by the OWNING SparkSession (not its SparkContext): sibling
  * sessions from `spark.newSession()` share one context, and a
  * context-keyed drain would unpersist handles a sibling still serves
  * (ADVICE r15). A library caller that never drains is bounded by the
  * stopped-context sweep in [[register]]: once the context dies the
  * strong references go with the next registration.
  */
object CacheRegistry {
  private val counter = new java.util.concurrent.atomic.AtomicLong
  private val handles = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, Long), DataFrame]

  /** Track a persisted DataFrame for unpersist at the next drain,
    * owned by the frame's own session. NOT for frames built inside
    * `foreachBatch` — Structured Streaming hands the batch a CLONED
    * session, so `df.sparkSession` would never match the caller's
    * drain; use the explicit-owner overload there.
    */
  def register(df: DataFrame): DataFrame = register(df, df.sparkSession)

  /** Track a persisted DataFrame under an explicit owning session (the
    * session whose drain should release it).
    */
  def register(df: DataFrame, owner: SparkSession): DataFrame = {
    // opportunistic sweep: entries whose context has stopped can never
    // be drained through their session again — drop the references
    handles.keys.filter(_._1.sparkContext.isStopped)
      .foreach(handles.remove)
    handles.put((owner, counter.incrementAndGet()), df)
    df
  }

  /** Unpersist every handle registered by THIS session (sibling
    * sessions sharing the context keep theirs).
    */
  def drain(s: SparkSession): Unit =
    handles.keys.filter(_._1 eq s).foreach { k =>
      handles.remove(k).foreach(_.unpersist())
    }
}
