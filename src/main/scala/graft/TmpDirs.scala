package graft

/** Registry for scratch directories created inside gate harnesses.
  *
  * Gate builders (streaming replays, sink round-trips, persisted-index
  * gates) return LAZY frames whose plans read parquet they staged under
  * a fresh temp dir, so the builder cannot delete its own scratch — the
  * caller's action still has to read it. Before this registry each gate
  * leaked its dirs (a full Verify+Bench run left GBs under /tmp).
  * Builders register dirs here; the consumer (Verify / Bench / specs)
  * calls [[releaseAll]] once the action completes — the same contract
  * as [[Caches]], for the filesystem instead of block storage. A JVM
  * shutdown hook sweeps whatever a crashed or partial run left behind.
  */
object TmpDirs {
  private val live = scala.collection.mutable.LinkedHashSet.empty[String]

  /** Create a fresh temp directory under the given name prefix and
    * track it for [[releaseAll]]. */
  def create(prefix: String): String = synchronized {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    live += d
    d
  }

  /** Track an externally created scratch dir for [[releaseAll]]. */
  def track(dir: String): String = synchronized { live += dir; dir }

  private def deleteRecursively(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))

  /** Delete every tracked directory and forget them. Call only after
    * the consuming action has run — a gate's returned frame reads these
    * paths lazily. */
  def releaseAll(): Unit = synchronized {
    live.foreach(deleteRecursively)
    live.clear()
  }

  // backstop for crashed/partial runs (tests, aborted gates): whatever
  // is still tracked at JVM exit is swept. Explicit releaseAll between
  // queries remains the real hygiene — the hook only bounds leakage to
  // one process lifetime instead of forever.
  java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() =>
    synchronized { live.foreach(deleteRecursively); live.clear() }))
}
