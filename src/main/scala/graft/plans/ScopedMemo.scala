package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded home for per-invocation cached intermediates — the round-12
  * sweep of the systemic `.cache()`-without-unpersist leak (VERDICT r11
  * items 1-2).
  *
  * The pattern being retired: a query body pins an intermediate with a
  * bare `.cache()` because its own plan reads it 2-4 times, and nobody
  * ever unpersists it. Each invocation leaves one orphaned block set in
  * the CacheManager for the life of the session; a 451-key bench session
  * accumulates hundreds, and once the storage pool fills, LRU eviction
  * thrash replaces them with multiplicative lineage recomputation — the
  * exact failure the driver's r11 bench recorded (betweenness 48.9 s vs
  * an 8 s clean budget, cache-kernel families inflated 3-6×).
  *
  * The fix is the discipline the shared kernels already use: every
  * formerly-bare cache routes through ONE bounded [[DfLru]], keyed
  * `(session, "<op>#<sfDir>[#conf-tags]")`. Past [[Cap]] live entries the
  * least-recently-used victim is unpersisted and dropped, so a whole-
  * registry session holds at most [[Cap]] scoped block sets at any
  * moment instead of one per invocation ever made. Consumers of an
  * evicted frame stay correct — the plan recomputes — they just lose the
  * memo, and since each bench/verify key is invoked once, eviction order
  * across keys is free. Re-invocations of the SAME key (tests, verify +
  * bench in one session) now also reuse one instance instead of pinning
  * a fresh copy.
  *
  * The memo key must carry every session-conf knob the body reads (state
  * mode, thresholds) — same contract as `Graph.lpaLabels`' "#st=" tag —
  * or a conf flip would hand back the other mode's table.
  */
object ScopedMemo {
  /** Max scoped intermediates pinned at once, across ALL modules. Sized
    * to the widest single query (betweenness pins 4 layer/delta tables;
    * the ANN sweep pins its shared legs) with headroom for a consumer
    * composing two such queries — far below the ~450 an unbounded bench
    * session used to accumulate, and small enough that [[Cap]] sf0.1
    * intermediates fit executor storage with room to spare.
    */
  private[graft] val Cap = 16

  private val cache = new DfLru(Cap)

  /** Memoized cache-and-materialize: first touch caches `body` and runs
    * the materializing count OUTSIDE the memo lock (DfLru single-flight);
    * later touches hand back the same pinned instance. Eager on purpose —
    * the kernels' `InMemoryRelation` must exist before the enclosing plan
    * is walked, and lazy pins are what leaked.
    */
  def apply(s: SparkSession, key: String)(body: => DataFrame): DataFrame =
    cache.getOrCompute((s, key), {
      val df = body.cache()
      // if the materializing count fails, the cache() registration must
      // not outlive the failed compute: an entry that never reaches the
      // LRU would be the unmanaged-pin pattern back through the error
      // path (ADVICE r12), invisible to the leak census because failed
      // keys abort the registry pass
      try df.count()
      catch { case t: Throwable => df.unpersist(blocking = false); throw t }
      df
    })

  /** Live entry count (leak-tripwire spec hook). */
  def size: Int = cache.size
}
