package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded LRU memo for per-(session, sf-dir) cached DataFrames — closes
  * ADVICE r6/r7's "weak/evicting shingle-cache keys" item.
  *
  * The memo maps in [[graft.ops.Dedup]] hold strong refs to BOTH the
  * SparkSession and a `.cache()`d DataFrame. Purging stopped-session keys
  * (kept here) bounds the maps to live sessions, but a single long-lived
  * session touching many sf dirs (sweep notebooks, multi-SF test suites)
  * still accumulated one pinned InMemoryRelation per dir forever. This
  * wrapper adds the missing half: access-ordered LRU with a small cap,
  * and eviction UNPERSISTs the victim's storage before dropping the ref —
  * consumers still holding the evicted frame stay correct (the plan
  * simply recomputes), they just lose the memo.
  *
  * All access is synchronized on the underlying map — entry count is a
  * handful and compute bodies build lazy plans (the one exception,
  * connected-component labels, materializes eagerly; its runtime is the
  * kernel itself, not contention).
  */
final class DfLru(maxEntries: Int) {
  require(maxEntries >= 1)

  private val m =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame])
          : Boolean =
        if (size() > maxEntries) {
          if (!e.getKey._1.sparkContext.isStopped) {
            try e.getValue.unpersist(false)
            catch { case _: Throwable => () } // never fail the insert path
          }
          true
        } else false
    }

  /** Memoized lookup: returns the cached instance for `k`, computing (and
    * LRU-inserting) it on first touch. Stopped-session keys are purged on
    * every call, so dead sessions can't be pinned.
    */
  def getOrCompute(k: (SparkSession, String), f: => DataFrame): DataFrame =
    m.synchronized {
      m.keySet.removeIf(e => e._1.sparkContext.isStopped)
      val hit = m.get(k)
      if (hit != null) hit
      else {
        val v = f
        m.put(k, v)
        v
      }
    }

  /** Current entry count (test hook). */
  def size: Int = m.synchronized(m.size())

  /** Whether `k` is currently memoized (test hook). */
  def contains(k: (SparkSession, String)): Boolean =
    m.synchronized(m.containsKey(k))
}
