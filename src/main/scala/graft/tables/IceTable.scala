package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Iceberg-style table: partitioned parquet + a JSON snapshot/manifest
  * log with atomic commits, per-partition lineage + metrics rows, and
  * bucket-group checkpoint markers for resumability.
  *
  * Mirrors the reference's snapshot discipline (backup_manager.py:23-77:
  * timestamped validated snapshots, list, restore) at table granularity
  * (SURVEY.md §7.2). No Iceberg runtime jar exists in this environment,
  * so the metadata layer is implemented from scratch over the Hadoop
  * FileSystem API (works on local FS and HDFS/S3A alike).
  *
  * Layout:
  * {{{
  *   root/data/commit-<id>/grp=G/bucket=B/part-*.parquet
  *   root/metadata/snap-<n>.json           — file list + lineage + metrics
  *   root/metadata/version-hint.text       — latest snapshot number
  *   root/metadata/progress/<id>/group-G.done — resume checkpoint markers
  *   root/metadata/lineage/<id>/           — per-bucket lineage parquet
  * }}}
  *
  * Commit protocol: data files land under a commit-unique directory
  * (never mutated), the snapshot JSON is written to a temp name and
  * renamed into place, and the version hint flips last — a crash at any
  * point leaves the previous snapshot intact and readable ("crash
  * before pointer flip = invisible"). Recovery never trusts the hint
  * alone: readers fall back to listing `snap-*.json` for the max n.
  */
final class IceTable(val root: String, spark: SparkSession) {

  private val conf = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = new Path(root).getFileSystem(conf)

  private def metaDir = new Path(root, "metadata")
  private def snapPath(n: Long) = new Path(metaDir, s"snap-$n.json")
  private def hintPath = new Path(metaDir, "version-hint.text")

  import IceTable.{DataFileEntry, Snapshot}

  // ---- snapshot log ---------------------------------------------------

  /** Latest snapshot id: hint if valid, else list-scan (crash-safe). */
  def currentSnapshotId: Option[Long] = {
    val listed: Seq[Long] =
      if (!fs.exists(metaDir)) Nil
      else fs.listStatus(metaDir).toSeq
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("snap-") && s.endsWith(".json") =>
          s.stripPrefix("snap-").stripSuffix(".json").toLong
        }
    if (listed.isEmpty) None else Some(listed.max)
  }

  def snapshots: Seq[Long] = {
    if (!fs.exists(metaDir)) return Nil
    fs.listStatus(metaDir).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("snap-") && s.endsWith(".json") =>
        s.stripPrefix("snap-").stripSuffix(".json").toLong
      }.sorted
  }

  def readSnapshot(n: Long): Snapshot = {
    val in = fs.open(snapPath(n))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    parseSnapshot(txt)
  }

  /** Read the table at a snapshot (time travel) or latest. Each
    * snapshot records the schema it was committed with (schema
    * evolution story: data dirs are per-commit, so historic snapshots
    * keep their own schema; the read validates the files still carry
    * every recorded field — drift fails loudly instead of silently
    * returning nulls). */
  def read(asOf: Option[Long] = None): DataFrame = {
    val id = asOf.orElse(currentSnapshotId)
      .getOrElse(throw new IllegalStateException(s"no snapshot in $root"))
    val snap = readSnapshot(id)
    assemble(snap, snap.files)
  }

  /** Range read over the table's designated stats column: data files
    * are pruned from MANIFEST statistics alone (no footer opens, no
    * scan — Iceberg's data-file skipping), then the row-level filter
    * runs on the survivors. Stats pruning is a strict superset of the
    * matching rows, and files without recorded stats are never pruned,
    * so the result equals `read().filter(col BETWEEN lo AND hi)`
    * exactly — including across manifests written before stats
    * existed. The win at scale: a time-sliced read of a long streaming
    * append chain opens only the micro-batch commits whose [min,max]
    * overlap the slice. */
  def readRange(statsCol: String, lo: Long, hi: Long,
                asOf: Option[Long] = None): DataFrame = {
    require(lo <= hi, s"readRange: lo $lo > hi $hi")
    val id = asOf.orElse(currentSnapshotId)
      .getOrElse(throw new IllegalStateException(s"no snapshot in $root"))
    val snap = readSnapshot(id)
    val keep = snap.files.filter { f =>
      (f.statsMin, f.statsMax) match {
        case (Some(mn), Some(mx)) => mx >= lo && mn <= hi
        case _ => true // no stats recorded — must scan
      }
    }
    if (keep.isEmpty) {
      // schema-correct empty result: the contract is exact equality
      // with read().filter(...), so downstream column references must
      // still resolve. limit(0) folds to an empty LocalRelation at
      // planning — no data file is read.
      if (snap.files.isEmpty) return spark.emptyDataFrame
      val all = assemble(snap, snap.files)
      return all.filter(statLong(all, statsCol).between(lo, hi)).limit(0)
    }
    val df = assemble(snap, keep)
    df.filter(statLong(df, statsCol).between(lo, hi))
  }

  /** Incremental read: only the data files ADDED between two snapshots
    * (exclusive `fromSnapshot`, inclusive `toSnapshot`) — the Iceberg
    * incremental-consumption pattern, letting a downstream pipeline
    * process each append delta exactly once instead of rescanning the
    * accumulated table. Works from manifests alone (set difference of
    * file lists); an overwrite commit's files appear in full, since
    * they are all new. */
  def readIncremental(fromSnapshot: Long, toSnapshot: Long): DataFrame = {
    require(fromSnapshot <= toSnapshot,
      s"readIncremental: from $fromSnapshot > to $toSnapshot")
    val to = readSnapshot(toSnapshot)
    val seen = readSnapshot(fromSnapshot).files.map(_.path).toSet
    val delta = to.files.filterNot(f => seen.contains(f.path))
    // empty delta must still carry the table schema (downstream
    // pipelines select columns from it); limit(0) reads no data
    if (delta.isEmpty && to.files.nonEmpty)
      return assemble(to, to.files).limit(0)
    assemble(to, delta)
  }

  /** Roll the table back to an earlier snapshot's state by committing
    * a NEW snapshot that re-references the old file list (Iceberg
    * rollback): history stays append-only — nothing is deleted, the
    * abandoned snapshots remain time-travelable until expired. */
  def rollback(toSnapshot: Long): Long = {
    val target = readSnapshot(toSnapshot)
    val parent = currentSnapshotId
      .getOrElse(throw new IllegalStateException(s"no snapshot in $root"))
    require(toSnapshot <= parent, s"rollback target $toSnapshot is not in the past")
    // re-reference the target's lineage too: lineage(asOf=new) must
    // describe the data the new snapshot actually reads
    flipSnapshot(s"rollback-to-$toSnapshot", target.files, target.rows,
      target.schemaFields.getOrElse(Nil), parent,
      lineageOverride = Some(target.lineagePath))
  }

  private def assemble(snap: Snapshot, files: Seq[DataFileEntry]): DataFrame = {
    val id = snap.id
    if (files.isEmpty) return spark.emptyDataFrame
    // explicit manifest file list (Iceberg-style: plans from metadata,
    // no directory listing on the read path); basePath recovers the
    // grp/bucket partition columns for partition pruning. Append
    // snapshots carry files from several commit dirs — one read per
    // dir (each with its own basePath), unioned.
    val byCommit = files
      .groupBy(f => commitDirOf(f.path).getOrElse(snap.commitId)).toSeq.sortBy(_._1)
    // allowMissingColumns: an append chain whose commits carry
    // different column sets reads as the union schema with nulls for
    // the fields a commit predates — the Iceberg schema-evolution
    // semantic (old data files simply lack new columns). The recorded-
    // schema validation below still fails loudly if the union is
    // missing a field the snapshot recorded.
    val df = byCommit.map { case (c, fsOfC) =>
      spark.read
        .option("basePath", s"$root/data/commit-$c")
        .parquet(fsOfC.map(_.path): _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true)).drop("grp")
    snap.schemaFields.foreach { recorded =>
      val have = df.columns.toSet
      val missing = recorded.filterNot(have)
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"snapshot $id schema drift: recorded fields missing from data: ${missing.mkString(",")}")
    }
    df
  }

  /** Field names recorded with a snapshot (None for pre-v1 snapshots). */
  def schemaOf(snapshotId: Long): Option[Seq[String]] =
    readSnapshot(snapshotId).schemaFields

  /** Per-bucket lineage + metrics rows of a snapshot. */
  def lineage(asOf: Option[Long] = None): DataFrame = {
    val id = asOf.orElse(currentSnapshotId)
      .getOrElse(throw new IllegalStateException(s"no snapshot in $root"))
    spark.read.parquet(readSnapshot(id).lineagePath)
  }

  // ---- commit ----------------------------------------------------------

  /** Atomic overwrite-commit of `df` (already carrying a `bucket`
    * column), processed in `groups` resumable bucket-groups.
    *
    * Each group is one Spark job writing `data/commit-<id>/group=G/`
    * partitioned by bucket, plus that group's lineage rows, plus a
    * `.done` marker. A re-run with the same `commitId` skips finished
    * groups — "resumable from checkpoint after any executor loss"
    * (north rule). The snapshot flips only after every group landed.
    */
  def commit(df: DataFrame, commitId: String, groups: Int = 8,
             abortAfterGroup: Int = -1,
             statsCol: Option[String] = None,
             distribution: String = "hash"): Long = {
    val (files, rows) = writeGroups(df, commitId, groups, abortAfterGroup,
      distribution)
    // an overwrite manifest is parent-independent, so the freshest
    // parent read is correct; a racing flip still collides on the
    // snapshot id and raises ConcurrentCommitException
    flipSnapshot(commitId, withStats(files, statsCol), rows, df.columns.toSeq,
      currentSnapshotId.getOrElse(-1L))
  }

  /** APPEND-commit: like `commit`, but the new snapshot's manifest is
    * the parent snapshot's file list PLUS this commit's files — the
    * Iceberg append semantic, enabling incremental/streaming ingestion
    * where every micro-batch becomes a snapshot and the latest
    * snapshot always reads the full accumulated table. Idempotent on
    * replay of the same commitId (finished group markers skip the
    * write; a commitId's files are filtered from the parent list
    * before re-adding, so they are never double-counted). The
    * snapshot's `lineage` stays per-commit (the DELTA's lineage). */
  def commitAppend(df: DataFrame, commitId: String, groups: Int = 1,
                   statsCol: Option[String] = None): Long = {
    val parentId = currentSnapshotId
    val parent = parentId.map(readSnapshot)
    // replay safety: if the parent snapshot already carries this
    // commitId's files (crash AFTER the flip, foreachBatch replays the
    // batch), its row count already includes the delta — don't re-add
    val parentHadThis =
      parent.exists(_.files.exists(_.path.contains(s"/commit-$commitId/")))
    val parentFiles = parent.map(_.files).getOrElse(Nil)
      .filterNot(_.path.contains(s"/commit-$commitId/"))
    // distribution "none" (r6): micro-batch appends are small, their
    // caller-shaped layout usually carries contiguous statsCol ranges
    // per task, and re-hashing would collapse each bucket to one file
    // whose [min,max] spans the whole batch — destroying the per-file
    // stats pruning readRange depends on. Small-file growth is the
    // compact() job's concern (Iceberg's same split of duties).
    val (files, rows) = writeGroups(df, commitId, groups, -1,
      distribution = "none")
    val mergedRows = parent.map(_.rows).getOrElse(0L) +
      (if (parentHadThis) 0L else rows)
    // CAS against the parent this manifest was BUILT from: a racing
    // commit that landed after our parent read must make THIS flip
    // fail (the merged file list would silently drop its files if we
    // re-read the current snapshot here) — caller retries, re-reading
    // the new parent. Parent files keep the stats they already carry;
    // only THIS commit's fresh files are scanned for theirs.
    flipSnapshot(commitId, (parentFiles ++ withStats(files, statsCol)).sortBy(_.path),
      mergedRows, df.columns.toSeq, parentId.getOrElse(-1L))
  }

  private def writeGroups(df: DataFrame, commitId: String, groups: Int,
                          abortAfterGroup: Int,
                          distribution: String): (Seq[DataFileEntry], Long) = {
    require(df.columns.contains("bucket"), "df must carry a bucket column")
    val dataDir = new Path(root, s"data/commit-$commitId")
    val progressDir = new Path(metaDir, s"progress/$commitId")
    val lineageDir = s"$root/metadata/lineage/$commitId"
    fs.mkdirs(progressDir)

    val grouped = df.withColumn("grp", pmod(col("bucket"), lit(groups)))

    def doGroup(g: Int): Unit = {
      val marker = new Path(progressDir, s"group-$g.done")
      if (!fs.exists(marker)) {
        // hash-distribute the slice by its partition columns before the
        // write (r6 — the Iceberg write.distribution-mode=hash
        // analogue, guide §6): without it every input task held rows
        // of every bucket and the dynamic writer opened one file per
        // (task × bucket) — a tiny-file explosion (tasks×buckets files
        // per group) that dominated commit wall time with per-file
        // writer setup and per-file commit moves. One task per
        // (grp,bucket) writes one right-sized file; `buckets` is the
        // deployment-side knob that sizes those files (corpus/buckets
        // ≈ target file size).
        val base = grouped.filter(col("grp") === g)
        val slice =
          if (distribution == "hash") base.repartition(col("grp"), col("bucket"))
          else base
        val t0 = System.nanoTime()
        // grp/bucket as real partition dirs: a consistent two-level
        // layout for partition discovery AND bucket-level pruning.
        // Dynamic overwrite clears ONLY this group's partitions — a
        // group job that died mid-write is cleanly replaced on resume,
        // never duplicated.
        slice.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("grp", "bucket").parquet(dataDir.toString)
        val elapsedMs = (System.nanoTime() - t0) / 1000000
        // lineage: one row per logical bucket (never per salted split —
        // SURVEY.md §7.7), written alongside the group's data; it
        // aggregates the UN-redistributed slice (map-side combine from
        // the cached input — no need to pay the write's exchange again)
        grouped.filter(col("grp") === g).groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("rows"),
            sum(when(col("error").isNotNull, 1L).otherwise(0L)).as("error_rows"),
            // P6 analogue: blank extractions counted at the sink
            // (main_window.py:784-786 refuses empty saves; we record)
            sum(when(col("error").isNull && length(coalesce(col("text"), lit(""))) === 0, 1L)
              .otherwise(0L)).as("empty_rows"),
            // O4 analogue: >20-part documents warn-counted, not dropped
            // (main_window.py:342-344)
            sum(when(size(split(coalesce(col("text"), lit("")), "--- صفحة ", -1)) - 1 > 20, 1L)
              .otherwise(0L)).as("oversize_docs"),
            sum(length(coalesce(col("text"), lit("")))).as("text_chars"))
          .withColumn("grp", lit(g))
          .withColumn("elapsed_ms", lit(elapsedMs))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("grp").parquet(lineageDir)
        val out = fs.create(marker, true)
        out.write(s"group $g done".getBytes("UTF-8")); out.close()
      }
    }

    if (abortAfterGroup >= 0 || groups <= 1) {
      // sequential path: the abort test hook needs a deterministic
      // "after group g" point (simulated executor/driver loss)
      (0 until groups).foreach { g =>
        doGroup(g)
        if (g == abortAfterGroup)
          throw new IllegalStateException(s"simulated crash after group $g")
      }
    } else {
      // OVERLAPPED group jobs (r6, guide §2.6): group writes are
      // independent (disjoint grp= partition dirs, disjoint lineage
      // partitions, per-job staging dirs), and running them from a
      // small pool lets the next group's tasks back-fill executors
      // freed by the current group's write tail — actions were only
      // sequential because this loop called them sequentially. Resume
      // and cancel semantics are unchanged: markers still flip only
      // after a group's data+lineage landed, unfinished groups are
      // cleanly re-written by the dynamic overwrite on re-run, and the
      // pool threads inherit the caller's cancellable job group
      // (thread-locals are inheritable at thread creation).
      if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) {
        // fill the shared cache ONCE before concurrent jobs: a cold
        // cache raced by several group jobs would compute the same
        // upstream (extraction) partitions more than once
        grouped.count()
      }
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(groups, 3))
      try {
        val futs = (0 until groups).map { g =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = doGroup(g)
          })
        }
        // propagate the first real failure (unwrap the pool's wrapper)
        futs.foreach { fut =>
          try fut.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw if (e.getCause != null) e.getCause else e
          }
        }
      } finally pool.shutdownNow()
    }

    // collect this commit's file list and its row count
    val files = listParquet(dataDir)
    val rows = spark.read.parquet(lineageDir).agg(sum("rows")).collect()(0).getLong(0)
    (files, rows)
  }

  /** Atomic snapshot flip: write the manifest to a committer-unique
    * temp name, publish it to `snap-<n>.json` with create-if-absent
    * semantics, then advance the version hint — a crash at any point
    * leaves the previous snapshot intact and readable.
    *
    * Concurrency: two committers that both observed parent `n-1` race
    * for the same `snap-<n>.json`; exactly one publish succeeds and the
    * loser gets [[IceTable.ConcurrentCommitException]]. The loser's
    * data/lineage dirs are unreferenced by any snapshot (safe to
    * delete), and a retry of the same commit is cheap: finished-group
    * markers skip the data rewrite, so only the manifest flip re-runs
    * against the new parent. */
  private[tables] def flipSnapshot(commitId: String, files: Seq[DataFileEntry],
                                   rows: Long, schemaFields: Seq[String],
                                   parent: Long,
                                   lineageOverride: Option[String] = None): Long = {
    val lineageDir =
      lineageOverride.getOrElse(s"$root/metadata/lineage/$commitId")
    val next = parent + 1
    val json = renderSnapshot(Snapshot(next, parent, commitId, files, rows, lineageDir,
      Some(schemaFields)))
    fs.mkdirs(metaDir)
    val tmp = new Path(metaDir, s".snap-$next.json.$commitId.tmp")
    val o = fs.create(tmp, true); o.write(json.getBytes("UTF-8")); o.close()
    if (!publishNew(tmp, snapPath(next)))
      throw new IceTable.ConcurrentCommitException(next, commitId)
    val h = fs.create(hintPath, true); h.write(next.toString.getBytes("UTF-8")); h.close()
    next
  }

  /** Publish `tmp` as `dst` atomically, failing (false) if `dst`
    * already exists. On `file://` this must be a hard link: POSIX
    * rename(2) silently OVERWRITES an existing destination, so the
    * local-FS rename cannot detect a concurrent commit. The rename
    * path is restricted to schemes whose rename is known to FAIL on an
    * existing destination (HDFS and its drop-ins): on s3a/abfs/gcs a
    * rename would silently clobber a racing committer's snapshot and
    * defeat the CAS entirely, so any other scheme fails loudly — those
    * stores need a catalog for the pointer swap, which is exactly why
    * Iceberg puts it in a catalog, not the FS. */
  private[tables] def publishNew(tmp: Path, dst: Path): Boolean = {
    val scheme = fs.getUri.getScheme
    if ("file".equals(scheme)) {
      val t = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri)
      val d = java.nio.file.Paths.get(fs.makeQualified(dst).toUri)
      try {
        java.nio.file.Files.createLink(d, t)
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false)
          false
      }
    } else if (RenameCasSchemes.contains(scheme)) {
      fs.rename(tmp, dst)
    } else {
      throw new UnsupportedOperationException(
        s"IceTable snapshot CAS is not safe on scheme '$scheme': rename " +
          "does not fail on an existing destination there, so a racing " +
          "commit would be silently overwritten. Use file://, an " +
          "HDFS-compatible store, or front the table with a catalog.")
    }
  }

  /** Schemes whose FileSystem.rename has fail-if-exists semantics
    * (the HDFS contract), making a bare rename a usable CAS. */
  private val RenameCasSchemes = Set("hdfs", "viewfs", "webhdfs", "swebhdfs")

  /** Compact the current snapshot: rewrite every live file into one
    * fresh overwrite-commit (Iceberg rewrite_data_files analogue) —
    * counters the small-file accumulation of per-micro-batch streaming
    * appends. Old commit dirs become unreferenced once pre-compaction
    * snapshots expire. */
  def compact(commitId: String, groups: Int = 1): Long =
    commit(read(), commitId, groups)

  /** Commit-directory name referenced by a data file path. */
  private def commitDirOf(path: String): Option[String] =
    """data/commit-([^/]+)/""".r.findFirstMatchIn(path).map(_.group(1))

  /** Expire snapshots older than `keep` latest ones: delete their
    * manifests and any data-commit directories no surviving snapshot
    * references (backup retention discipline — the reference prunes by
    * listing+selection, backup_manager.py:63-77; Iceberg calls this
    * expire_snapshots). References are tracked per FILE, not per
    * snapshot commitId — append snapshots carry files from many commit
    * dirs, all of which must survive. The current snapshot is never
    * expired. */
  def expireSnapshots(keep: Int): Seq[Long] = {
    require(keep >= 1)
    val all = snapshots
    if (all.length <= keep) return Nil
    val (drop, keepIds) = all.splitAt(all.length - keep)
    val keptSnaps = keepIds.map(readSnapshot)
    val referenced = (keptSnaps.map(_.commitId) ++
      keptSnaps.flatMap(_.files.flatMap(f => commitDirOf(f.path)))).toSet
    val dropped = drop.filter { id =>
      val snap = readSnapshot(id)
      fs.delete(snapPath(id), false)
      val dirs = (snap.files.flatMap(f => commitDirOf(f.path)) :+ snap.commitId).distinct
      dirs.filterNot(referenced.contains).foreach { c =>
        fs.delete(new Path(root, s"data/commit-$c"), true)
        fs.delete(new Path(root, s"metadata/lineage/$c"), true)
        fs.delete(new Path(metaDir, s"progress/$c"), true)
      }
      true
    }
    dropped
  }

  /** Completed resume groups for a commit (test/ops introspection). */
  def completedGroups(commitId: String): Set[Int] = {
    val p = new Path(metaDir, s"progress/$commitId")
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("group-") && s.endsWith(".done") =>
        s.stripPrefix("group-").stripSuffix(".done").toInt
      }.toSet
  }

  /** Attach per-file min/max of `statsCol` (cast to long) to fresh
    * commit entries — ONE column-pruned scan of just-written files,
    * the write-side statistics collection Iceberg performs inline.
    * Files where the column is entirely null keep no stats (and are
    * therefore never pruned — correct, since they hold no matching
    * rows but pruning must stay a superset). */
  /** The long image of a stats column: timestamps map through
    * unix_micros (Spark refuses a direct timestamp→long cast),
    * integer types cast. Shared by stats collection and readRange so
    * the recorded numbers and the filter always speak the same unit. */
  private def statLong(df: DataFrame, c: String): org.apache.spark.sql.Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
      case _ => col(c).cast("long")
    }

  private def withStats(files: Seq[DataFileEntry],
                        statsCol: Option[String]): Seq[DataFileEntry] = {
    val c = statsCol.getOrElse(return files)
    if (files.isEmpty) return files
    // input_file_name() is a file URI (file:///...); manifest paths
    // come from Hadoop Path.toString (file:/...) — compare scheme-free
    def norm(p: String): String = p.replaceFirst("^[a-zA-Z0-9.+-]+:/+", "/")
    val fresh = spark.read.parquet(files.map(_.path): _*)
    val stats = fresh
      .select(input_file_name().as("__f"), statLong(fresh, c).as("__v"))
      .groupBy("__f").agg(min("__v").as("lo"), max("__v").as("hi"))
      .collect()
      .flatMap { r =>
        if (r.isNullAt(1) || r.isNullAt(2)) None
        else Some(norm(r.getString(0)) -> (r.getLong(1), r.getLong(2)))
      }.toMap
    files.map { f =>
      stats.get(norm(f.path))
        .map { case (lo, hi) => f.copy(statsMin = Some(lo), statsMax = Some(hi)) }
        .getOrElse(f)
    }
  }

  private def listParquet(dir: Path): Seq[DataFileEntry] = {
    val out = ArrayBuffer.empty[DataFileEntry]
    if (!fs.exists(dir)) return out.toSeq
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        out += DataFileEntry(f.getPath.toString, f.getLen)
    }
    out.sortBy(_.path).toSeq
  }

  // ---- tiny dependency-free JSON (driver-side metadata only) ----------

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def renderSnapshot(s: Snapshot): String = {
    val files = s.files.map { f =>
      val stats = (f.statsMin, f.statsMax) match {
        case (Some(lo), Some(hi)) => s""","min":$lo,"max":$hi"""
        case _ => ""
      }
      s"""{"path":${q(f.path)},"bytes":${f.bytes}$stats}"""
    }.mkString("[", ",", "]")
    val schema = s.schemaFields
      .map(fs => s""","schema":${fs.map(q).mkString("[", ",", "]")}""")
      .getOrElse("")
    s"""{"format_version":1,"snapshot_id":${s.id},"parent_id":${s.parentId},"commit_id":${q(s.commitId)},
       |"rows":${s.rows},"lineage":${q(s.lineagePath)}$schema,"files":$files}""".stripMargin
  }

  private def parseSnapshot(txt: String): Snapshot = {
    // purpose-built parser for renderSnapshot's fixed shape; unknown
    // keys are ignored (forward-tolerant), known keys are extracted by
    // name so field ORDER never matters; format_version gates reads of
    // manifests newer than this reader understands
    def longFieldOpt(k: String): Option[Long] =
      (s""""$k":(-?\\d+)""").r.findFirstMatchIn(txt).map(_.group(1).toLong)
    def longField(k: String): Long = longFieldOpt(k)
      .getOrElse(throw new IllegalStateException(s"bad snapshot json: $k"))
    def strField(k: String): String = {
      val m = (s""""$k":"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(txt)
        .getOrElse(throw new IllegalStateException(s"bad snapshot json: $k"))
      m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
    }
    val version = longFieldOpt("format_version").getOrElse(0L)
    if (version > 1L)
      throw new IllegalStateException(
        s"snapshot format_version $version is newer than this reader (supports ≤1)")
    val files = ("""\{"path":"((?:[^"\\]|\\.)*)","bytes":(\d+)(?:,"min":(-?\d+),"max":(-?\d+))?\}""").r
      .findAllMatchIn(txt)
      .map(m => DataFileEntry(
        m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"), m.group(2).toLong,
        Option(m.group(3)).map(_.toLong), Option(m.group(4)).map(_.toLong)))
      .toSeq
    val schemaFields = (""""schema":\[((?:"(?:[^"\\]|\\.)*",?)*)\]""").r
      .findFirstMatchIn(txt).map { m =>
        ("""\"((?:[^"\\]|\\.)*)\"""").r.findAllMatchIn(m.group(1))
          .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
      }
    Snapshot(longField("snapshot_id"), longField("parent_id"),
      strField("commit_id"), files, longField("rows"), strField("lineage"),
      schemaFields)
  }
}

object IceTable {
  /** A racing committer published this snapshot id first. The failed
    * commit's data dirs are unreferenced (expirable); retrying the
    * commit is cheap — finished-group markers skip the data rewrite. */
  final class ConcurrentCommitException(val snapshotId: Long, val commitId: String)
      extends IllegalStateException(
        s"concurrent commit detected: snap-$snapshotId already published (commit $commitId lost the race)")

  /** One data file in a manifest. `statsMin`/`statsMax` optionally
    * carry the file's min/max of the table's designated long-typed
    * stats column (Iceberg data-file statistics): readRange prunes
    * files from METADATA alone — no footer opens, no scan — and old
    * manifests without stats stay readable (the file is simply never
    * pruned). */
  final case class DataFileEntry(path: String, bytes: Long,
                                 statsMin: Option[Long] = None,
                                 statsMax: Option[Long] = None)
  final case class Snapshot(
      id: Long,
      parentId: Long,
      commitId: String,
      files: Seq[DataFileEntry],
      rows: Long,
      lineagePath: String,
      schemaFields: Option[Seq[String]] = None)
}
