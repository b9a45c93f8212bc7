package graft

/** Run two INDEPENDENT driver-side actions concurrently (guide §2.6:
  * Spark's scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because driver code calls
  * them sequentially). The paired-artifact writers here — a soft-dedup
  * state's band and shingle families, a search index's postings and
  * lens, an ANN index's vectors and bands — each publish two relations
  * with no data dependency, and running the second publish's jobs while
  * the first one's write tail drains back-fills otherwise idle cores.
  * At production scale the same overlap fills the cluster during each
  * write's straggler tail; locally it roughly halves the paired-write
  * wall time.
  *
  * Failure contract: both sides always run to completion (no
  * cancellation channel — each side is an independently crash-safe
  * publish protocol); the FIRST throwable (left side preferred) is
  * rethrown, the other attached as suppressed, so no failure is
  * silently swallowed. Leases: [[graft.streaming.MaintenanceLease]] is
  * re-entrant PER THREAD, so sides must not rely on a lease the calling
  * thread holds — fine for the family-dir publishes (each acquires its
  * own family lease; the caller's root lease is advisory across
  * threads), asserted by the existing lifecycle specs. */
object Par {
  def run2(a: => Unit, b: => Unit): Unit = {
    @volatile var bErr: Throwable = null
    val t = new Thread(() => {
      try b catch { case e: Throwable => bErr = e }
    }, "graft-par-2")
    t.start()
    var aErr: Throwable = null
    try a catch { case e: Throwable => aErr = e }
    t.join()
    if (aErr != null) {
      if (bErr != null) aErr.addSuppressed(bErr)
      throw aErr
    }
    if (bErr != null) throw bErr
  }
}
