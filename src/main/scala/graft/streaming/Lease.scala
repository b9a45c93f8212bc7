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
  *     broken and acquisition proceeds. The break is an ATOMIC RENAME
  *     of the expired lease file to a unique sideline name, not a
  *     delete: two acquirers racing to break the same expired lease
  *     would otherwise interleave read→delete→create such that the
  *     loser's delete destroys the winner's freshly-created LIVE lease
  *     and both sweeps run — the exact double-writer the lease exists
  *     to prevent. With rename, exactly one breaker's rename succeeds
  *     (the source exists only once); the loser re-enters the create
  *     race cleanly. An EMPTY or UNPARSEABLE token is NOT treated as
  *     expired: on HDFS an in-flight create is visible before its bytes
  *     are (len 0 until the writer closes), so a zero/garbled read gets
  *     bounded retries with a short backoff — transient in-flight
  *     creates resolve into a valid token; only a token still
  *     unreadable after the retries is adjudicated corrupt (an
  *     incident artifact, not a race) and broken via the same rename.
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
  * filesystems cannot do atomically. What CAN be done cheaply is a
  * best-effort fence at the single most consequential namespace op —
  * the snapshot-publish rename — and [[fenceCheck]] provides exactly
  * that: re-read the lease immediately before the publish and refuse
  * if this thread's token is no longer the holder. It narrows the
  * stalled-holder window from "whole sweep" to "between the fence read
  * and the rename" (milliseconds) without pretending to close it. On object stores without atomic
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

  // canonical-path -> (re-entry depth, our token), per thread (sweeps are
  // driver-side and single-threaded per job; nesting is same-thread by
  // construction). The token rides along so fenceCheck can verify the
  // file still carries it without the caller threading it through.
  private val held = new ThreadLocal[scala.collection.mutable.Map[String, (Int, String)]] {
    override def initialValue() =
      scala.collection.mutable.Map.empty[String, (Int, String)]
  }

  private def leasePath(fs: FileSystem, dir: String): Path =
    fs.makeQualified(new Path(dir, LeaseName))

  /** None = no lease file. The open itself is guarded: a lease released
    * between the exists and the open (a live store) must read as absent,
    * not abort the caller. Shared with [[StoreFsck]]'s audit so the
    * read semantics cannot drift between acquire and audit. */
  private[streaming] def readToken(fs: FileSystem, p: Path): Option[String] =
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
        finally in.close()
      }
    } catch { case _: java.io.FileNotFoundException => None }

  /** None = the token carries no parseable expiry — an in-flight create
    * whose bytes are not yet visible, or corrupt junk. NOT conflated
    * with "expired": the acquire loop retries these (transient) before
    * adjudicating corrupt, instead of instantly breaking what may be a
    * live competitor's half-visible lease. */
  private[streaming] def parseExpiry(token: String): Option[Long] =
    token.split("\\s+").collectFirst {
      case s if s.startsWith("expiresAtMs=") => s.stripPrefix("expiresAtMs=")
    }.flatMap(v => scala.util.Try(v.toLong).toOption)

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
      val (d, tok) = depths(key)
      depths(key) = (d + 1, tok)
      try body finally {
        val (d2, tok2) = depths(key)
        if (d2 == 1) depths.remove(key) else depths(key) = (d2 - 1, tok2)
      }
    } else {
      val token =
        s"owner=${java.util.UUID.randomUUID()} " +
          s"expiresAtMs=${System.currentTimeMillis() + ttlMs}"
      acquire(fs, p, dir, token)
      depths(key) = (1, token)
      var bodyFailed: Throwable = null
      try body
      catch { case t: Throwable => bodyFailed = t; throw t }
      finally {
        depths.remove(key)
        // release by RENAME-CLAIM, not read-then-delete: the read-verify
        // form has the same race the break path had — between our read
        // (seeing our token) and our delete, a competitor can break our
        // now-expired lease and create its own, and the delete then
        // destroys that LIVE lease silently. The rename claims whatever
        // file is there atomically; only then is it inspected.
        val sideline = new Path(p.getParent,
          s"${p.getName}.release.${java.util.UUID.randomUUID()}")
        val claimed = try fs.rename(p, sideline)
                      catch { case _: java.io.FileNotFoundException => false }
        val lost: Option[LeaseLostException] =
          if (!claimed) Some(LeaseLostException(dir, "<gone>"))
          else {
            val tok = readToken(fs, sideline)
            if (tok.contains(token)) { // ours — clean release
              try fs.delete(sideline, false)
              catch { case _: java.io.IOException => () }
              None
            } else {
              // we claimed a FOREIGN lease (ours was TTL-broken and a
              // new holder created theirs): restore it and report the
              // loss loudly. If the restore rename fails, yet another
              // acquirer re-created the path in the window — the
              // sideline is then redundant junk and the foreign holder
              // finds out at ITS release (loud there, not silent here).
              try { if (!fs.rename(sideline, p)) fs.delete(sideline, false) }
              catch { case _: java.io.IOException => () }
              Some(LeaseLostException(dir, tok.getOrElse("<gone>")))
            }
          }
        lost.foreach { l =>
          // don't mask the body's own failure — attach instead
          if (bodyFailed != null) bodyFailed.addSuppressed(l)
          else throw l
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

  /** Break `p` (observed expired/corrupt) by ATOMIC RENAME to a unique
    * sideline name, then reclaim the sideline. Rename, not delete: a
    * delete racing another breaker can land AFTER that breaker's fresh
    * create and destroy a live lease; a rename moves exactly the file
    * we observed — if a competitor renamed it first, ours fails cleanly
    * and we just re-enter the create race. The sideline delete is
    * best-effort cleanup (a crash between rename and delete leaves an
    * inert `.broken.` file [[StoreFsck]] reports as residue). */
  private def breakLease(fs: FileSystem, p: Path): Unit = {
    val sideline = new Path(p.getParent,
      s"${p.getName}.broken.${java.util.UUID.randomUUID()}")
    val won = try fs.rename(p, sideline)
              catch { case _: java.io.FileNotFoundException => false }
    if (won) try fs.delete(sideline, false) catch { case _: java.io.IOException => () }
  }

  private def acquire(fs: FileSystem, p: Path, dir: String,
                      token: String): Unit = {
    var attempts = 0
    var unreadableReads = 0
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
            parseExpiry(t) match {
              case Some(exp) if exp < System.currentTimeMillis() =>
                // crashed holder: sideline the expired lease atomically
                // and retry the create (a racing breaker loses the
                // rename or the create cleanly, never a live lease)
                breakLease(fs, p)
                if (attempts >= 5)
                  throw LeaseHeldException(dir, parseOwner(t), exp)
              case Some(exp) => throw LeaseHeldException(dir, parseOwner(t), exp)
              case None =>
                // empty/garbled token: likely an in-flight create whose
                // bytes are not yet visible — held-retry with backoff,
                // NOT expired (breaking here would kill a live
                // competitor's lease mid-create). Persistent junk after
                // the retries is adjudicated corrupt and broken.
                unreadableReads += 1
                if (unreadableReads <= 3) Thread.sleep(50L * unreadableReads)
                else breakLease(fs, p)
                if (attempts >= 10)
                  throw LeaseHeldException(dir, "<unreadable token>", -1L)
            }
        }
      }
    }
  }

  /** Best-effort WRITE FENCE for the most consequential op a sweep runs
    * under this lease (the snapshot-publish rename): verify the lease
    * file still carries the calling thread's token and throw
    * [[LeaseLostException]] BEFORE the caller's rename if it does not —
    * a stalled holder whose lease was TTL-broken is refused at publish
    * time instead of detected post-hoc at release. No-op when the
    * calling thread holds no lease on `dir` (publish outside a sweep,
    * e.g. a store's initial seed). Advisory-grade: the window between
    * this read and the caller's rename remains open (plain filesystems
    * have no compare-and-rename); it shrinks the race from sweep-length
    * to milliseconds. */
  def fenceCheck(spark: SparkSession, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val qualified = fs.makeQualified(new Path(dir)).toString
    // fence against every held lease GUARDING this dir — the exact dir
    // AND ancestors: composed sweeps lease a store root and publish to
    // nested paths (annRebandSweep holds storeRoot, publishes
    // storeRoot/bands), and an exact-path lookup would silently no-op
    // for exactly those publishes
    held.get().foreach { case (leaseKey, (_, token)) =>
      val guardedDir = leaseKey.stripSuffix("/" + LeaseName)
      if (qualified == guardedDir || qualified.startsWith(guardedDir + "/")) {
        val lp = new Path(leaseKey)
        val now = readToken(fs, lp)
        if (!now.contains(token))
          throw LeaseLostException(guardedDir, now.getOrElse("<gone>"))
      }
    }
  }
}
