package graft.streaming

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read-only consistency audit (`fsck`) for the delta stores — the
  * operational complement of the write-side protocols: every marker,
  * staging dir, and retention state those protocols can leave behind is
  * individually self-healing, but an operator staring at a store
  * directory after an incident has had no way to tell "benign residue
  * the next sweep reclaims" from "a condition that needs action". This
  * walks a store root and reports findings with a severity:
  *
  *   - `error` — an invariant is broken; serving may be wrong or a
  *     sweep will refuse (act before the next maintenance window);
  *   - `warn`  — self-healing state that nevertheless signals an
  *     incident (a crashed in-place replace awaiting heal, a stale
  *     lease from a dead sweep, an uncommitted partial on an object
  *     store);
  *   - `info`  — expected protocol residue (covered deltas and
  *     superseded snapshots awaiting retirement, legacy pre-marker
  *     snapshots, an active lease).
  *
  * STRICTLY read-only: fsck never repairs (the sweeps own repair —
  * [[StreamingPipeline.compactDeltas]] heals/GCs on its way in), so it
  * is safe to run against a LIVE store under active writers; a finding
  * observed mid-write (e.g. a staging dir) is at worst transiently
  * stale, never harmful. Not a data-plane operator (no DuckDB gate, by
  * design — it audits filesystem protocol state, not query results);
  * FsckSpec plants each condition and asserts the finding. */
object StoreFsck {

  final case class Finding(family: String, check: String, severity: String,
                           detail: String)

  /** Audit `storeRoot`. Families are auto-discovered: the root itself
    * and every direct subdirectory that carries delta-store state
    * (`b<id>` / `v=<id>` dirs or a schema/format stamp). `tombstones`
    * is audited with its own checks (high-water consistency) rather
    * than the family ones. */
  def fsckStore(spark: SparkSession, storeRoot: String): DataFrame = {
    import spark.implicits._
    val root = new Path(storeRoot)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val out = scala.collection.mutable.ArrayBuffer.empty[Finding]
    if (!fs.exists(root)) {
      out += Finding("<root>", "missing-root", "error",
        s"store root $storeRoot does not exist")
      return out.toSeq.toDF()
    }

    val children = fs.listStatus(root).toSeq
    def isFamilyDir(s: FileStatus): Boolean = s.isDirectory && {
      val n = s.getPath.getName
      !n.startsWith("_") && n != "tombstones" &&
        fs.listStatus(s.getPath).exists { c =>
          val cn = c.getPath.getName
          StreamingPipeline.DeltaName.findFirstIn(cn).isDefined ||
            StreamingPipeline.SnapshotName.findFirstIn(cn).isDefined ||
            cn == StreamingPipeline.SchemaMarker ||
            cn == StreamingPipeline.FormatMarker
        }
    }
    val rootIsFamily = children.exists { c =>
      val n = c.getPath.getName
      StreamingPipeline.DeltaName.findFirstIn(n).isDefined ||
        StreamingPipeline.SnapshotName.findFirstIn(n).isDefined
    }
    val familyDirs =
      (if (rootIsFamily) Seq("" -> storeRoot) else Seq.empty) ++
        children.filter(isFamilyDir)
          .map(s => s.getPath.getName -> s.getPath.toString)

    // ---- store-level: families stamp vs discovered family dirs
    StreamingPipeline.stampedFamilies(spark, storeRoot).foreach { stamped =>
      val found = familyDirs.map(_._1).filter(_.nonEmpty).toSet
      (stamped -- found).toSeq.sorted.foreach { f =>
        out += Finding(f, "stamped-family-missing", "error",
          s"families marker names '$f' but no such family dir exists — " +
            "composed erasure would refuse, and a fold of the others " +
            "cannot cover it")
      }
      (found -- stamped).toSeq.sorted.foreach { f =>
        out += Finding(f, "family-not-stamped", "warn",
          s"family dir '$f' is not in the families marker — composed " +
            "erasure will NOT fold it (its rows would survive tombstone " +
            "retirement)")
      }
    }

    // ---- store-level: tombstones high-water consistency
    val tombDir = s"$storeRoot/tombstones"
    StreamingPipeline.listVersions(spark, tombDir,
      StreamingPipeline.DeltaName).foreach { deltas =>
      val hw = StreamingPipeline.readTombstoneHighWater(spark, tombDir)
      deltas.maxOption.foreach { mx =>
        if (hw < mx + 1)
          out += Finding("tombstones", "highwater-behind", "error",
            s"high-water $hw < max delta id $mx + 1 — a crash between " +
              "delta write and marker update; the next writeTombstones " +
              "self-heals the floor, but a caller holding a stale upto " +
              "could retire live tombstones before then")
      }
      if (deltas.nonEmpty)
        out += Finding("tombstones", "live-tombstones", "info",
          s"${deltas.size} unretired tombstone delta(s) — serving masks; " +
            "retire after every family folds past the deletes")
    }

    // ---- per-family checks
    familyDirs.foreach { case (name, dirStr) =>
      val label = if (name.isEmpty) "<root>" else name
      val dir = new Path(dirStr)
      val kids = fs.listStatus(dir).toSeq

      kids.filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(StreamingPipeline.ReplacedPrefix))
        .foreach { s =>
          val v = s.getPath.getName.stripPrefix(StreamingPipeline.ReplacedPrefix)
          val replacementLanded = fs.exists(new Path(dir, s"v=$v"))
          out += Finding(label, "heal-pending", "warn",
            s"parked snapshot ${s.getPath.getName} from a crashed in-place " +
              s"replace (replacement v=$v ${if (replacementLanded) "landed"
              else "MISSING — readers currently serve without this boundary"}); " +
              "the next sweep heals it")
        }

      kids.filter(s => s.isDirectory && {
          val n = s.getPath.getName
          n.startsWith("_compact_staging_") || n.startsWith("_graft_swap_staging_") ||
            n.startsWith("_graft_erase_staging_")
        }).foreach { s =>
          out += Finding(label, "crashed-staging", "info",
            s"staging dir ${s.getPath.getName} from an interrupted write — " +
              "invisible to readers; the next sweep overwrites or GC's it")
        }

      val allSnaps = StreamingPipeline.listVersions(spark, dirStr,
        StreamingPipeline.SnapshotName).getOrElse(Seq.empty)
      val committed = StreamingPipeline.committedSnapshots(spark, dirStr)
      val objectStore = StreamingPipeline.objectStoreSemantics(spark, fs)
      (allSnaps.toSet -- committed.toSet).toSeq.sorted.foreach { v =>
        out += Finding(label, "uncommitted-snapshot", "warn",
          s"v=$v has no commit marker — a crashed direct-write partial; " +
            "readers ignore it and the next sweep GC's it")
      }
      if (!objectStore)
        allSnaps.sorted.foreach { v =>
          if (!fs.exists(new Path(dir, s"v=$v/${StreamingPipeline.CommitMarkerName}")))
            out += Finding(label, "legacy-unmarked-snapshot", "info",
              s"v=$v carries no commit marker — pre-marker-era snapshot; " +
                "served normally under the rename protocol (existence is " +
                "commit there)")
        }
      if (committed.size > 1)
        out += Finding(label, "superseded-snapshots", "info",
          s"${committed.size} snapshots (newest v=${committed.max}) — older " +
            "ones are retirement residue; the next sweep reclaims them")
      val deltas = StreamingPipeline.listVersions(spark, dirStr,
        StreamingPipeline.DeltaName).getOrElse(Seq.empty)
      committed.maxOption.foreach { newest =>
        val covered = deltas.count(_ <= newest)
        if (covered > 0)
          out += Finding(label, "covered-deltas", "info",
            s"$covered delta dir(s) with id <= v=$newest — readers skip " +
              "them; the next sweep reclaims them")
      }

      // schema stamp parseability
      StreamingPipeline.stampedSchema(spark, dirStr).foreach { ddl =>
        try org.apache.spark.sql.types.StructType.fromDDL(ddl)
        catch { case e: Exception =>
          out += Finding(label, "schema-stamp-unparseable", "error",
            s"schema marker does not parse as DDL ('${ddl.take(80)}'): " +
              s"${e.getMessage} — every fold of this family will refuse")
        }
      }

      // lease state
      val lease = new Path(dir, MaintenanceLease.LeaseName)
      if (fs.exists(lease)) {
        val in = fs.open(lease)
        val token =
          try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
          finally in.close()
        val expiry = token.split("\\s+").collectFirst {
          case s if s.startsWith("expiresAtMs=") =>
            s.stripPrefix("expiresAtMs=").toLong
        }.getOrElse(0L)
        if (expiry < System.currentTimeMillis())
          out += Finding(label, "stale-lease", "warn",
            s"maintenance lease expired at epoch-ms $expiry without release " +
              "— its holder crashed (or outlived its TTL); the next sweep " +
              "breaks it")
        else
          out += Finding(label, "active-lease", "info",
            s"maintenance sweep in progress (lease valid to epoch-ms $expiry)")
      }
    }

    if (out.isEmpty)
      out += Finding("<root>", "clean", "info",
        "no findings: snapshots committed, no residue, no live tombstones")
    out.sortBy(f => (f.family, f.check, f.detail)).toSeq.toDF()
  }
}
