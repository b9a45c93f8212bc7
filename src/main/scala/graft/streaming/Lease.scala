package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Exclusive MAINTENANCE LEASE for the delta-store sweeps — the
  * single-writer assumption every protocol in [[StreamingPipeline]]
  * makes, enforced instead of scaladoc'd. Two concurrently scheduled
  * sweeps of one store (a cron compaction racing an erasure, a retried
  * orchestrator task whose predecessor is still alive) would otherwise
  * interleave the park/refold/rename/GC steps: each step is
  * individually crash-safe, but e.g. sweep A parking `v=N` while
  * sweep B's healing pass restores it mid-refold publishes a snapshot
  * from half-retired deltas — silent data loss of exactly the kind the
  * per-step protocols were built to rule out. At 100 TB maintenance is
  * scheduled by a workflow engine with retries, so the double-writer
  * case is an operational certainty, not a corner.
  *
  * Design (all public knowledge — the classic HDFS advisory lock-file
  * pattern, cf. Spark's own streaming-checkpoint metadata protocol and
  * HBase's recovered-lease handling):
  *
  *   - One lease file `_graft_maintenance_lease` per guarded directory,
  *     created atomically-if-absent: `FileSystem.create(path,
  *     overwrite = false)` on HDFS (one namenode op); java.nio
  *     O_CREAT|O_EXCL on local paths (Hadoop's RawLocalFileSystem
  *     implements the same call as exists-then-create, which is NOT
  *     atomic — see [[MaintenanceLease.createExclusive]]). The file
  *     body carries `owner=<uuid> expiresAtMs=<ts>`.
  *   - A conflicting acquire reads the holder: an UNEXPIRED lease is a
  *     loud [[MaintenanceLease.LeaseHeldException]] (the caller's
  *     scheduler retries after the holder finishes); an EXPIRED one is
  *     broken (delete + re-create — the holder crashed without
  *     releasing) and acquisition proceeds.
  *   - REENTRANT per thread: composed sweeps nest ([[StreamingPipeline.eraseFromNearDupStores]]
  *     holds the store root while [[StreamingPipeline.compactDeltas]]
  *     re-acquires the same path for the family fold), tracked by a
  *     thread-local depth map, no second file op.
  *   - Release verifies the file still carries OUR token before
  *     deleting. If it does not, the lease expired mid-sweep and
  *     another writer broke it — the sweep's writes may have raced, so
  *     release THROWS [[MaintenanceLease.LeaseLostException]] rather
  *     than returning success (set `ttlMs` comfortably above the
  *     longest sweep; the default is 15 min, delta-store folds at this
  *     scale run seconds).
  *
  * Honest limits, stated rather than papered over: this is an ADVISORY
  * lease — it excludes writers that take it (every sweep in this
  * module does), not arbitrary foreign processes; and TTL-breaking a
  * live-but-stalled holder is detected at that holder's RELEASE (loud,
  * post-hoc), not fenced at its in-flight writes — true write fencing
  * needs an epoch check inside every namespace op, which plain
  * filesystems cannot do atomically. On object stores without atomic
  * create-if-absent the create..verify round-trip below narrows but
  * cannot close the race window; production object-store deployments
  * should point maintenance at a real lock service and this lease
  * degrades to best-effort detection there (same posture as
  * Spark's own file-based streaming commit logs). */
object MaintenanceLease {

  val LeaseName = "_graft_maintenance_lease"

  /** Default time-to-live. A sweep that can outlive this must pass its
    * own budget — an expired-but-alive holder is broken by the next
    * acquirer and only finds out at release. */
  val DefaultTtlMs: Long = 15L * 60 * 1000

  final case class LeaseHeldException(dir: String, owner: String,
                                      expiresAtMs: Long)
    extends IllegalStateException(
      s"maintenance lease on $dir is held by $owner until epoch-ms " +
        s"$expiresAtMs — a concurrent sweep is running; retry after it " +
        "releases (or expires, if it crashed)")

  final case class LeaseLostException(dir: String, observed: String)
    extends IllegalStateException(
      s"maintenance lease on $dir was lost mid-sweep (now: $observed) — " +
        "the sweep outlived its TTL and another writer broke the lease; " +
        "its writes may have raced. Re-run the sweep with a larger ttlMs " +
        "and audit the store (every step is individually crash-safe, so " +
        "a re-run heals single-writer damage; interleaved-writer damage " +
        "needs the audit).")

  // canonical-path -> re-entry depth, per thread (sweeps are driver-side
  // and single-threaded per job; nesting is same-thread by construction)
  private val held = new ThreadLocal[scala.collection.mutable.Map[String, Int]] {
    override def initialValue() = scala.collection.mutable.Map.empty[String, Int]
  }

  private def leasePath(fs: FileSystem, dir: String): Path =
    fs.makeQualified(new Path(dir, LeaseName))

  private def readToken(fs: FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }

  private def parseExpiry(token: String): Long =
    token.split("\\s+").collectFirst {
      case s if s.startsWith("expiresAtMs=") =>
        s.stripPrefix("expiresAtMs=").toLong
    }.getOrElse(0L) // unparseable/legacy junk counts as expired

  private def parseOwner(token: String): String =
    token.split("\\s+").collectFirst {
      case s if s.startsWith("owner=") => s.stripPrefix("owner=")
    }.getOrElse("<unknown>")

  /** Run `body` holding the exclusive maintenance lease on `dir`.
    * Re-entrant per thread. Throws [[LeaseHeldException]] without
    * touching the store if another writer holds an unexpired lease. */
  def withLease[T](spark: SparkSession, dir: String,
                   ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val p = leasePath(fs, dir)
    val key = p.toString
    val depths = held.get()
    if (depths.contains(key)) { // re-entrant fast path
      depths(key) += 1
      try body finally {
        depths(key) -= 1
        if (depths(key) == 0) depths.remove(key)
      }
    } else {
      val token =
        s"owner=${java.util.UUID.randomUUID()} " +
          s"expiresAtMs=${System.currentTimeMillis() + ttlMs}"
      acquire(fs, p, dir, token)
      depths(key) = 1
      var bodyFailed: Throwable = null
      try body
      catch { case t: Throwable => bodyFailed = t; throw t }
      finally {
        depths(key) -= 1
        if (depths(key) == 0) depths.remove(key)
        val now = readToken(fs, p)
        if (now.contains(token)) fs.delete(p, false)
        else {
          val lost = LeaseLostException(dir, now.getOrElse("<gone>"))
          // don't mask the body's own failure — attach instead
          if (bodyFailed != null) bodyFailed.addSuppressed(lost)
          else throw lost
        }
      }
    }
  }

  /** Create the lease file if absent, atomically, with `token` as its
    * whole body. Returns false if it already exists.
    *
    * HDFS: `FileSystem.create(path, overwrite = false)` is an atomic
    * namenode op. Local paths: Hadoop's RawLocalFileSystem implements
    * the same call as exists-then-create — NOT atomic; two threads can
    * interleave the check and the second create TRUNCATES the winner's
    * file, which the post-create verify only narrows, not closes
    * (caught by LeaseSpec's 8-way stress under load). POSIX has the
    * real primitive — O_CREAT|O_EXCL — so on the `file` scheme the
    * write goes through java.nio CREATE_NEW instead. */
  private def createExclusive(fs: FileSystem, p: Path,
                              token: String): Boolean = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        Option(local.getParent)
          .foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(local, token.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else
      try {
        // parent dirs are created implicitly (a first sweep may run
        // before the store's first delta lands)
        val out = fs.create(p, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException
          if e.getMessage != null && e.getMessage.contains("exist") => false
      }
  }

  private def acquire(fs: FileSystem, p: Path, dir: String,
                      token: String): Unit = {
    var attempts = 0
    var acquired = false
    while (!acquired) {
      attempts += 1
      val created = createExclusive(fs, p, token)
      if (created) {
        // verify our token survived — closes the overwrite race on
        // filesystems whose create(..., false) is not truly atomic
        if (readToken(fs, p).contains(token)) acquired = true
        else if (attempts >= 3)
          throw LeaseHeldException(dir, "<create race>", -1L)
      } else {
        val existing = readToken(fs, p)
        existing match {
          case None => // holder released between our create and read — retry
            if (attempts >= 5) throw LeaseHeldException(dir, "<flapping>", -1L)
          case Some(t) =>
            if (parseExpiry(t) < System.currentTimeMillis()) {
              // crashed holder: break the expired lease and retry the
              // atomic create (a racing breaker loses the create cleanly)
              fs.delete(p, false)
              if (attempts >= 5)
                throw LeaseHeldException(dir, parseOwner(t), parseExpiry(t))
            } else throw LeaseHeldException(dir, parseOwner(t), parseExpiry(t))
        }
      }
    }
  }
}
