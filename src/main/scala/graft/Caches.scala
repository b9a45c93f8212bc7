package graft

import org.apache.spark.sql.Dataset

/** Registry for intermediates persisted inside query builders.
  *
  * A query function returns a lazy DataFrame, so it cannot unpersist its
  * own intermediates (they must stay cached until the caller's action has
  * run). Builders register persists here; the consumer (Verify / Bench /
  * PipelineRunner / tests) calls [[releaseAll]] once the action completes.
  * Keeps cached storage bounded to one query's working set instead of
  * accumulating across the multi-query Verify/Bench session.
  */
object Caches {
  private val live = scala.collection.mutable.LinkedHashSet.empty[Dataset[_]]

  /** Persist `df` (MEMORY_AND_DISK) and track it for later release. */
  def persist[T](df: Dataset[T]): Dataset[T] = synchronized {
    live += df
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist every tracked relation and forget them.
    *
    * Blocking by default: a non-blocking unpersist leaves freed blocks to
    * be evicted lazily, and in a multi-query session (Bench/Verify) that
    * eviction + GC bleeds into the NEXT query's measured time — BENCH_r02
    * showed unchanged queries regressing 4x from exactly this.
    */
  def releaseAll(blocking: Boolean = true): Unit = synchronized {
    live.foreach(_.unpersist(blocking))
    live.clear()
  }
}
