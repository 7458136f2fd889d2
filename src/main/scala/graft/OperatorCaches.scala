package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Registry for the MEMORY_AND_DISK persists graft operators create
  * internally (pairing operators cache their multi-consumer subtrees so
  * one materialization feeds the self-join x/y plus side aggregates —
  * see winnowingShaPairs for why structural persist beats best-effort
  * exchange reuse).
  *
  * Operators return LAZY DataFrames, so they cannot unpersist their own
  * subtrees before the caller materializes the result — unpersisting a
  * cached relation replans its dependents to recompute uncached. The
  * lifetime contract is therefore: after materializing an operator's
  * result (collect/write/count), call [[OperatorCaches.release]] to drop
  * every graft-created cache. Unlike `spark.catalog.clearCache()` this
  * never touches caller-owned caches, so it is safe for library
  * embedders; Bench/Verify/ScaleRehearsal call it after each query's
  * drain.
  *
  * References are held STRONGLY on purpose: the operator-internal
  * Datasets go out of scope the moment the operator returns, so a weak
  * registry loses them to the first GC and release() silently leaks the
  * cache (observed). The strong ref pins only the Dataset object — the
  * real footprint is the cached blocks, which exist either way until
  * release() drops both.
  */
object OperatorCaches {
  private val tracked = ArrayBuffer.empty[Dataset[_]]

  /** Persist `ds` at `level` and register it for [[release]]. */
  def track[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] =
    synchronized {
      ds.persist(level)
      tracked += ds
      ds
    }

  /** Unpersist every tracked dataset and clear the registry. */
  def release(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking))
    tracked.clear()
  }

  /** Number of tracked (not yet released) entries — test hook. */
  def liveCount: Int = synchronized { tracked.size }

  /** Chainable form: `df.trackedPersist()` ≡ `OperatorCaches.track(df)`. */
  implicit class TrackedDataset[T](private val ds: Dataset[T]) extends AnyVal {
    def trackedPersist(
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] =
      track(ds, level)
  }
}
