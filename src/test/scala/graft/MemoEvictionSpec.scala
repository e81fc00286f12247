package graft

import org.apache.spark.sql.functions._
import graft.plans.DfLru

/** ADVICE r6/r7 closures with teeth:
  *
  *  - DfLru: the per-(session, sf) memo maps must EVICT (and unpersist)
  *    past their cap instead of pinning one InMemoryRelation per sf dir
  *    for the life of the session ("shingle-cache eviction").
  *  - prioritySample: the weight path must stay double end-to-end so an
  *    extreme BIGINT weight can neither overflow (the BIGINT-product
  *    failure at w >= 2^31 the old form risked) nor produce a NULL/NaN
  *    priority ("sample_priority weight overflow").
  */
class MemoEvictionSpec extends SparkSpec {

  test("DfLru evicts LRU past the cap and unpersists the victim") {
    val lru = new DfLru(2)
    def mk(tag: Int) = {
      val df = spark.range(tag, tag + 10L).toDF("id").cache()
      df.count()
      df
    }
    val a = lru.getOrCompute((spark, "a"), mk(0))
    lru.getOrCompute((spark, "b"), mk(100))
    assert(lru.size == 2)
    // touch a so b becomes the LRU victim
    lru.getOrCompute((spark, "a"), fail("a must be memoized"))
    lru.getOrCompute((spark, "c"), mk(200))
    assert(lru.size == 2)
    assert(lru.contains((spark, "a")) && lru.contains((spark, "c")))
    assert(!lru.contains((spark, "b")), "LRU victim must drop")
    // the victim's storage was released; the survivor's was not
    assert(a.storageLevel.useMemory, "survivor stays cached")
    // evicted frames still COMPUTE correctly (they just lost the memo)
    assert(mk(100).count() == 10L)
  }

  test("ScopedMemo returns a compacted IMR-leaf frame with identical " +
      "rows (r13: consumers must not re-pay analysis over memo lineage)") {
    import graft.plans.ScopedMemo
    val key = s"compaction_spec#${System.identityHashCode(this)}"
    def body = spark.range(0, 50L).toDF("id")
      .withColumn("v", col("id") * 2)
      .groupBy(expr("id % 5").as("g")).agg(sum(col("v")).as("s"))
    val memo = ScopedMemo(spark, key)(body)
    // the returned logical plan is the InMemoryRelation LEAF itself —
    // O(1) nodes — not the original scan+agg lineage
    val analyzed = memo.queryExecution.analyzed
    assert(analyzed.isInstanceOf[
        org.apache.spark.sql.execution.columnar.InMemoryRelation],
      s"expected an IMR leaf, got:\n$analyzed")
    // rows identical to the uncompacted body
    val got = memo.orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = body.orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(want), s"${got.toSeq} vs ${want.toSeq}")
    // a second touch hands back another leaf over the SAME cache entry
    val again = ScopedMemo(spark, key)(fail("memo hit must not re-run body"))
    assert(again.queryExecution.analyzed.isInstanceOf[
      org.apache.spark.sql.execution.columnar.InMemoryRelation])
    // post-materialization stats ride the leaf (broadcast decisions keep
    // working downstream of a compacted memo)
    assert(again.queryExecution.optimizedPlan.stats.sizeInBytes > 0)
  }

  test("an EVICTED compacted frame re-executes correctly and re-persists " +
      "at most one block set, not one per action (ADVICE r13 #2)") {
    import graft.plans.ScopedMemo
    // eviction unpersists the victim and removes its CacheManager entry,
    // but a consumer still holding the COMPACTED leaf re-executes through
    // the IMR's own CachedRDDBuilder, which re-materializes AND
    // re-persists its buffers with no CacheManager entry. That storage is
    // untracked-by-the-manager but BOUNDED: the builder memoizes its
    // buffer RDD, so repeated actions reuse one block set (freed by the
    // ContextCleaner once the frame is unreferenced). This pins both
    // halves: rows stay correct after eviction, and the census grows by
    // at most one entry across repeated re-executions.
    val lru = new DfLru(1)
    def build(lo: Long) = {
      val df = spark.range(lo, lo + 20L).toDF("id")
        .withColumn("v", col("id") * 3).cache()
      df.count()
      df
    }
    val compacted = ScopedMemo.compact(lru.getOrCompute((spark, "ek1"), build(0)))
    assert(compacted.queryExecution.analyzed.isInstanceOf[
      org.apache.spark.sql.execution.columnar.InMemoryRelation])
    // force eviction of ek1 (cap 1): its blocks are unpersisted
    lru.getOrCompute((spark, "ek2"), build(100))
    assert(!lru.contains((spark, "ek1")), "ek1 must be the LRU victim")
    val censusBefore = spark.sparkContext.getPersistentRDDs.size
    // re-execute the orphaned compacted frame several times
    (1 to 3).foreach { _ =>
      assert(compacted.count() == 20L)
      assert(compacted.agg(sum(col("v"))).head().getLong(0) == (0L until 20L).map(_ * 3).sum)
    }
    val censusAfter = spark.sparkContext.getPersistentRDDs.size
    assert(censusAfter - censusBefore <= 1,
      s"post-eviction re-execution must re-persist at most once, census " +
        s"grew $censusBefore -> $censusAfter")
  }

  test("DfLru getOrCompute purges stopped-session keys") {
    val lru = new DfLru(4)
    val dead = spark.newSession()
    // a key whose session "stops": simulate via an sc-stopped check — the
    // shared test SparkContext must NOT be stopped, so instead pin the
    // contract that live keys survive a purge pass
    lru.getOrCompute((dead, "x"), spark.range(1).toDF("id"))
    lru.getOrCompute((spark, "y"), spark.range(1).toDF("id"))
    assert(lru.contains((dead, "x")) && lru.contains((spark, "y")),
      "newSession shares a live context — nothing purges")
  }

  test("prioritySample survives extreme BIGINT weights (no overflow path)") {
    import spark.implicits._
    // weights straddling every risky regime: 0/negative (clamped to 1),
    // the 2^31 BIGINT-product cliff, and Long.MaxValue
    val docs = Seq(
      (1L, 0L), (2L, -5L), (3L, Int.MaxValue.toLong + 1L),
      (4L, Long.MaxValue), (5L, 1234567L))
      .toDF("doc_id", "n_chars")
      .withColumn("source", lit("s"))
    val out = graft.ops.TrainPrep
      .prioritySample(docs, "doc_id", "n_chars", 10)
      .select("doc_id", "w", "priority")
      .collect()
    assert(out.length == 5)
    out.foreach { r =>
      val w = r.getLong(1)
      val p = r.getDouble(2)
      assert(w >= 1L, s"weight must clamp to >= 1, got $w")
      assert(!p.isNaN && !p.isInfinite && p > 0d,
        s"priority must be a positive finite double, got $p")
    }
    // Long.MaxValue outranks everything at equal hash scale ONLY if the
    // double path held; the exact top doc depends on md5 draws, so pin
    // the weaker invariant: the two huge-weight docs beat the w=1 docs
    val byId = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(4L) > byId(1L) && byId(4L) > byId(2L))
  }

  test("graph_betweenness_sampled leaves no unmanaged persisted RDDs " +
      "behind (VERDICT r11 #1: four bare .cache() calls per invocation)") {
    val sc = spark.sparkContext
    // first invocation may add managed memo entries (ScopedMemo layers +
    // the shared edge/node kernels) — those are bounded by the LRU cap
    SparkEntry.queries("graph_betweenness_sampled")(spark, sf).count()
    assert(graft.plans.ScopedMemo.size <= graft.plans.ScopedMemo.Cap,
      s"ScopedMemo overflowed its cap: ${graft.plans.ScopedMemo.size}")
    val afterFirst = sc.getPersistentRDDs.keySet.toSet
    // the leak signature was one fresh orphaned block set PER INVOCATION:
    // a second run must hit the memos and pin NOTHING new
    SparkEntry.queries("graph_betweenness_sampled")(spark, sf).count()
    val afterSecond = sc.getPersistentRDDs.keySet.toSet
    assert((afterSecond -- afterFirst).isEmpty,
      s"re-invocation pinned new RDDs: ${afterSecond -- afterFirst}")
  }

  test("the whole registry runs in one session with a bounded " +
      "persisted-RDD census (the r12 cache-leak tripwire)") {
    // Run every registered query once — the exact shape of a bench/verify
    // session. Before the r12 sweep, ~25 per-invocation `.cache()` sites
    // each left one orphaned block set in the CacheManager forever; the
    // census after a full pass is the tripwire that keeps the pattern out.
    graft.ops.Joins.ensureBucketed(spark, sf)
    val sc = spark.sparkContext
    // transient localCheckpoint generations (BFS/k-core/HITS rotation)
    // free via the ContextCleaner on GC — drain them before counting so
    // the census sees only what is genuinely pinned
    // progress-based drain (ADVICE r12): poll the census and keep waiting
    // as long as the async ContextCleaner is still shrinking it, instead
    // of a fixed gc/sleep cycle count — under -XX:+DisableExplicitGC or a
    // slow cleaner the old 40x250ms budget false-failed. The loop exits
    // when the census is under the bound OR no entry has been freed for
    // `stallMs` (the cleaner is genuinely done, not merely slow).
    def drained(bound: Int): Int = {
      val stallMs = 30000L
      var last = sc.getPersistentRDDs.size
      var lastProgress = System.nanoTime()
      while (last > bound &&
          (System.nanoTime() - lastProgress) < stallMs * 1000000L) {
        System.gc(); Thread.sleep(200)
        val cur = sc.getPersistentRDDs.size
        if (cur < last) { last = cur; lastProgress = System.nanoTime() }
      }
      last
    }
    // DELTA census, not absolute: in the full suite, earlier specs pin
    // kernels for OTHER sf dirs (MultiSf/Golden/LargeSfOracle), so the
    // absolute count depends on suite order — what this tripwire owns is
    // the growth caused by ONE full-registry pass. The baseline gets a
    // few fixed GC cycles (bound 0 is unreachable while kernels are
    // legitimately pinned; 6 cycles empties the transient checkpoints).
    (1 to 6).foreach { _ => System.gc(); Thread.sleep(250) }
    val before = sc.getPersistentRDDs.size
    val (_, failed) = Bench.runQueries(spark, sf, SparkEntry.queries)
    assert(failed.isEmpty, s"failed: $failed")
    val n = drained(before + CensusDeltaBound)
    assert(n - before <= CensusDeltaBound,
      s"a full-registry pass grew the persisted-RDD census $before -> $n " +
        s"(delta bound $CensusDeltaBound) — a per-invocation cache leak " +
        "is back; route the new pin through graft.plans.ScopedMemo or a " +
        "Generations rotation")
    assert(graft.plans.ScopedMemo.size <= graft.plans.ScopedMemo.Cap)
  }

  /** Registry-pass growth ceiling — DERIVATION (keep in sync with the
    * census test above and SURVEY.md §7.5o): one full pass may
    * first-touch the shared kernels for its sf dir (Tables corpus, Graph
    * edges/nodes, Dedup shingle/band/labels/simhash, Similarity
    * vectors/pq/knn/sign, TextOps wordCounts, Aggregates kmv,
    * bucketed/zoned warm-ups — ~30 block sets, counted from the kernel
    * registry at the r12 sweep) plus up to the ScopedMemo LRU cap
    * (30 + 32 ≈ 62 legitimate since the r13 cap raise), rounded up for
    * Spark-internal persists. The number this must stay BELOW is the
    * leak signature it guards against: ≈ +1 per formerly-bare-cache key
    * (+25 on top of the kernels+cap, i.e. ~87+) — so the bound has real
    * headroom on the pass side and real teeth on the leak side.
    */
  private val CensusDeltaBound = 30 + graft.plans.ScopedMemo.Cap + 14
}
