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
  * Map access is synchronized on the underlying map, but compute bodies
  * run OUTSIDE the lock (ADVICE r8: some bodies are eager cache()+count()
  * jobs taking seconds — holding the monitor through one would block
  * lookups for every unrelated key/session on the same cache). A per-key
  * in-flight table gives single-flight semantics: concurrent callers of
  * the SAME key wait on the first builder's future; callers of OTHER keys
  * proceed immediately. If a builder fails, waiters retry the compute
  * themselves — a failure never caches.
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

  private val inFlight = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String),
    java.util.concurrent.CompletableFuture[DataFrame]]()

  /** Memoized lookup: returns the cached instance for `k`, computing (and
    * LRU-inserting) it on first touch. Stopped-session keys are purged on
    * every call, so dead sessions can't be pinned. Single-flight per key;
    * the compute body never runs under the map monitor.
    */
  @annotation.tailrec
  def getOrCompute(k: (SparkSession, String), f: => DataFrame): DataFrame = {
    // registration is lazy (first lookup), NOT in the constructor: a
    // constructor-time register published `this` before the map/inFlight
    // fields were initialized, so a concurrent clearAll() racing class
    // init could touch a half-constructed instance (ADVICE r9).
    DfLru.register(this)
    val fast = m.synchronized {
      m.keySet.removeIf(e => e._1.sparkContext.isStopped)
      Option(m.get(k))
    }
    fast match {
      case Some(v) => v
      case None =>
        val mine = new java.util.concurrent.CompletableFuture[DataFrame]()
        val other = inFlight.putIfAbsent(k, mine)
        if (other != null) {
          // another thread is building this key: wait it out, then re-read
          // the map — if the builder failed, the retry computes here
          try other.join()
          catch { case _: java.util.concurrent.CompletionException => () }
          getOrCompute(k, f)
        } else {
          // double-checked single-flight (ADVICE r9): a thread that missed
          // the fast path BEFORE a previous builder finished can win
          // putIfAbsent AFTER that builder's inFlight.remove — without this
          // re-check it would rebuild the already-memoized key, and the
          // overwritten entry's eagerly cache()d blocks would leak until
          // session stop. On a hit, complete the future with the found
          // value so late waiters observe it too.
          val done = m.synchronized(Option(m.get(k)))
          done match {
            case Some(v) =>
              mine.complete(v)
              inFlight.remove(k)
              v
            case None =>
              try {
                val v = f // OUTSIDE the map lock: may run eager Spark jobs
                m.synchronized(m.put(k, v))
                mine.complete(v)
                v
              } catch {
                case t: Throwable => mine.completeExceptionally(t); throw t
              } finally inFlight.remove(k)
          }
        }
    }
  }

  /** Current entry count (test hook). */
  def size: Int = m.synchronized(m.size())

  /** Whether `k` is currently memoized (test hook). */
  def contains(k: (SparkSession, String)): Boolean =
    m.synchronized(m.containsKey(k))

  /** Drop every memoized entry (without unpersisting — callers pair this
    * with `spark.catalog.clearCache()`, which already dropped the blocks).
    */
  def clear(): Unit = m.synchronized(m.clear())
}

object DfLru {
  private val instances =
    new java.util.concurrent.CopyOnWriteArrayList[DfLru]()

  // addIfAbsent: called from every getOrCompute (lazy registration), so
  // repeated calls must stay idempotent
  private def register(c: DfLru): Unit = instances.addIfAbsent(c)

  /** Forget every memo in every cache — the measurement-isolation hook
    * ([[graft.ScaleProbe]]): after `spark.catalog.clearCache()` has
    * dropped the cached blocks, a surviving memo would hand out frames
    * whose localCheckpoint'd lineage can no longer recompute, so the
    * memos must go with the blocks.
    */
  def clearAll(): Unit = instances.forEach(_.clear())
}
