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
  */
object CacheRegistry {
  private val counter = new java.util.concurrent.atomic.AtomicLong
  private val handles = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.SparkContext, Long), DataFrame]

  /** Track a persisted DataFrame for unpersist at the next drain. */
  def register(df: DataFrame): DataFrame = {
    handles.put((df.sparkSession.sparkContext, counter.incrementAndGet()), df)
    df
  }

  /** Unpersist every handle registered under this session's context. */
  def drain(s: SparkSession): Unit =
    handles.keys.filter(_._1 == s.sparkContext).foreach { k =>
      handles.remove(k).foreach(_.unpersist())
    }
}
