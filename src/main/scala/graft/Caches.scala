package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of every intermediate an operator pins with
  * `persist` (signature tables, bucket indexes, rank cells, …), so a
  * long-lived embedding application can release them all after it has
  * materialized a query's result — without the nuclear
  * `spark.catalog.clearCache()` (which would also evict tables the
  * APPLICATION cached on purpose).
  *
  * Discipline (mirrors kiara's job-scoped value lifetimes,
  * reference src/kiara/registries/data/__init__.py): operators call
  * `.persistTracked(…)` instead of `.persist(…)`; the harness
  * ([[Verify]], [[Bench]]) — or any embedding caller — calls
  * [[Caches.release]] once per query after its final action. Helper
  * caches exist to de-duplicate work WITHIN one query plan
  * (self-joins replay their upstream subtree), so their useful life
  * ends with the query; unpersisting an already-unpersisted table is
  * a no-op, so operators that release early (iterative loops) compose
  * fine.
  */
object Caches {

  private val reg = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Number of tracked (not-yet-released) intermediates. */
  def trackedCount: Int = reg.size

  /** Unpersist every tracked intermediate (non-blocking) and empty the
    * registry. Safe to call at any time: tables still referenced by an
    * un-materialized plan simply lose their cache pin and recompute. */
  def release(): Unit = {
    var d = reg.poll()
    while (d != null) {
      d.unpersist(blocking = false)
      d = reg.poll()
    }
  }

  implicit final class TrackedPersist[T](private val ds: Dataset[T])
      extends AnyVal {
    def persistTracked(): Dataset[T] = {
      val p = ds.persist()
      reg.add(p)
      p
    }
    def persistTracked(level: StorageLevel): Dataset[T] = {
      val p = ds.persist(level)
      reg.add(p)
      p
    }
  }
}
