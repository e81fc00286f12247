package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stale-generation memory discipline for fixed-round iterative
  * DataFrame loops (BFS frontiers, k-core alive sets, HITS scores).
  *
  * The failure mode this kills (VERDICT r7, `graph_bfs_layers` 15.5 s vs
  * a 2.2 s budget): a `foldLeft` that `.cache()`s every round's O(V)
  * table leaks one cached generation per round. Under session-long LRU
  * pressure the early generations evict, and any consumer that still
  * holds their lineage recomputes the whole chain — O(rounds²) passes
  * over the edge list.
  *
  * The fix is the `dedup_connected` discipline (Dedup.scala
  * `connectedComponents`): eagerly checkpoint the new round — cutting
  * lineage, so nothing can ever recompute the chain — then free the
  * PREVIOUS round's blocks, which at that point no live plan references.
  * `Dataset.unpersist()` is a silent no-op on a localCheckpoint'd frame
  * (checkpoint blocks never enter the CacheManager), so generations are
  * tracked and freed through their persisted RDD ids instead.
  *
  * The final generation's blocks stay alive only while the returned plan
  * is referenced; the ContextCleaner reclaims them on GC — unlike
  * `.cache()`, nothing is pinned in the CacheManager after the query.
  *
  * Honors [[graft.ops.Dedup.ReliableCheckpointKey]]: on a preemptible
  * cluster set it true (+ `sc.setCheckpointDir`) and each round writes a
  * reliable checkpoint that survives executor loss instead.
  */
final class Generations(s: SparkSession) {
  private val sc = s.sparkContext
  private val reliable =
    s.conf.get(graft.ops.Dedup.ReliableCheckpointKey, "false").toBoolean
  if (reliable) require(sc.getCheckpointDir.isDefined,
    s"${graft.ops.Dedup.ReliableCheckpointKey}=true needs " +
      "sc.setCheckpointDir(...) — a reliable checkpoint must land on " +
      "fault-tolerant storage")
  private var gen: Seq[org.apache.spark.rdd.RDD[_]] = Nil

  /** Eagerly materialize `df` as this tracker's new generation, then free
    * the previous one. Safe ordering: the eager checkpoint job CONSUMES
    * the old blocks before this method releases them.
    *
    * The new generation is identified DETERMINISTICALLY (ADVICE r8): a
    * checkpointed Dataset's analyzed plan is a `LogicalRDD` wrapping
    * exactly the RDD the checkpoint just persisted, so we capture that
    * reference instead of set-diffing `sc.getPersistentRDDs` around the
    * call — the diff could adopt (and later unpersist) a FOREIGN RDD
    * persisted concurrently by another query on the same SparkContext,
    * which for a localCheckpoint'd victim is unrecoverable (lineage
    * truncated → lost-block failure, not a recompute). If a future Spark
    * stops exposing `LogicalRDD` here we track nothing — a bounded leak
    * reclaimed by the ContextCleaner, never a wrongful free.
    */
  def rotate(df: DataFrame): DataFrame = {
    val out = if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    val next = out.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    gen.foreach(_.unpersist(blocking = false))
    gen = next
    out
  }
}
