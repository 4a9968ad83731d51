package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.ExtractJob
import graft.tables.IceTable

/** Snapshot/commit/lineage/resume semantics (SURVEY.md §7.2, north
  * rule: resumable from checkpoint, per-partition lineage+metrics). */
class IceTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(8, "graft-ice-test")

  private def tmpRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"icetable-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  val N = 600L

  test("commit → read back: full row set, snapshot metadata, lineage") {
    val root = tmpRoot("basic")
    val res = ExtractJob.run(spark, root, N, buckets = 16, groups = 4, commitId = "c0")
    assert(res.snapshotId == 0L && res.docs == N)
    val table = new IceTable(root, spark)
    val df = table.read()
    assert(df.count() == N)
    assert(df.columns.toSet == Set("url", "text", "spans", "lang", "error", "bucket"))
    val lin = table.lineage().collect()
    assert(lin.map(_.getAs[Long]("rows")).sum == N)
    assert(lin.length <= 16 && lin.length > 0) // one row per logical bucket
    val snap = table.readSnapshot(0L)
    assert(snap.files.nonEmpty && snap.rows == N)
    // lineage guard metrics present (P6/O4 analogues)
    assert(lin.head.schema.fieldNames.contains("empty_rows"))
    assert(lin.head.schema.fieldNames.contains("oversize_docs"))
    // event-log audit rows (S9/ST4 analogues): start + completion
    val m = new graft.pipeline.JobMetrics(spark, "probe")
    val events = m.readEventLog(root)
    m.close()
    assert(events.exists(_.contains("job_start")), events.mkString("\n"))
    assert(events.exists(_.contains("commit_complete snapshot=0")), events.mkString("\n"))
    assert(events.forall(_.matches("^\\d{4}-\\d{2}-\\d{2}T.*")), "ISO-timestamped lines")
  }

  test("bucket predicate prunes data files at the scan (the 100×-scale read path)") {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val root = tmpRoot("prune")
    ExtractJob.run(spark, root, N, buckets = 16, groups = 4, commitId = "c0")
    val table = new IceTable(root, spark)
    val allFiles = table.read().select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(allFiles.size >= 8, s"need a multi-bucket layout, got ${allFiles.size} files")
    val pruned = table.read().filter(col("bucket") === 3)
    // the predicate must reach the scan as a PARTITION filter (metadata
    // pruning), not a post-scan row filter over every file
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      plan.take(1200))
    // and the files ACTUALLY read are exactly the bucket=3 leafs
    val readFiles = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(readFiles.nonEmpty && readFiles.forall(_.contains("/bucket=3/")),
      readFiles.take(5).toString)
    assert(readFiles == allFiles.filter(_.contains("/bucket=3/")))
    assert(readFiles.size < allFiles.size, "pruning must drop non-matching buckets")
  }

  test("crash after k groups → rerun completes only remaining groups; table identical") {
    val rootA = tmpRoot("resume")
    val rootB = tmpRoot("clean")
    // simulated loss after group 1 of 4
    intercept[IllegalStateException] {
      ExtractJob.run(spark, rootA, N, buckets = 16, groups = 4,
        commitId = "c0", abortAfterGroup = 1)
    }
    val table = new IceTable(rootA, spark)
    assert(table.completedGroups("c0") == Set(0, 1))
    assert(table.currentSnapshotId.isEmpty, "no snapshot may be visible pre-finalize")
    // resume with the same commitId
    val res = ExtractJob.run(spark, rootA, N, buckets = 16, groups = 4, commitId = "c0")
    assert(res.docs == N)
    // byte-identical to a never-crashed run
    val clean = ExtractJob.run(spark, rootB, N, buckets = 16, groups = 4, commitId = "c0")
    assert(clean.docs == N)
    val a = table.read().select("url", "text", "error").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val b = new IceTable(rootB, spark).read().select("url", "text", "error").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("second commit becomes a new snapshot; time travel reads the old one") {
    val root = tmpRoot("timetravel")
    ExtractJob.run(spark, root, 200L, buckets = 8, groups = 2, commitId = "c0")
    val table = new IceTable(root, spark)
    ExtractJob.run(spark, root, 400L, buckets = 8, groups = 2, commitId = "c1")
    assert(table.snapshots == Seq(0L, 1L))
    assert(table.read(Some(0L)).count() == 200L)
    assert(table.read(Some(1L)).count() == 400L)
    assert(table.read().count() == 400L)
    // expire: old snapshot + its unreferenced data go away, latest intact
    assert(table.expireSnapshots(keep = 1) == Seq(0L))
    assert(table.snapshots == Seq(1L))
    assert(table.read().count() == 400L)
    intercept[Exception] { table.readSnapshot(0L) }
  }

  test("text sink writes UTF-8 lines and refuses an all-blank save") {
    import org.apache.spark.sql.functions._
    val out = tmpRoot("textsink") + "/txt"
    val extracted = graft.pipeline.ExtractPipeline.extracted(
      graft.pipeline.ExtractPipeline.pages(spark, 100).toDF())
    val n = graft.pipeline.TextSink.save(extracted, out)
    assert(n > 80 && spark.read.text(out).count() == n)
    val line = spark.read.text(out).orderBy("value").collect()(0).getString(0)
    assert(line.contains("\t--- صفحة 1 ---\\n"), line.take(120))
    intercept[graft.pipeline.TextSink.EmptyOutputException] {
      graft.pipeline.TextSink.save(
        extracted.filter(lit(false)), tmpRoot("textsink2") + "/txt")
    }
  }

  test("commitAppend replay of the same commitId is idempotent") {
    import org.apache.spark.sql.functions._
    val root = tmpRoot("append-replay")
    val table = new IceTable(root, spark)
    val df = spark.range(0, 50).select(col("id"),
      pmod(col("id"), lit(4)).cast("int").as("bucket"),
      lit(null).cast("string").as("error"), lit("t").as("text"))
    table.commitAppend(df, "b0")
    val s2 = table.commitAppend(df, "b1")
    val before = table.readSnapshot(s2)
    // foreachBatch replay after a crash-after-flip: same batch id again
    val s3 = table.commitAppend(df, "b1")
    val after = table.readSnapshot(s3)
    assert(after.files.map(_.path) == before.files.map(_.path), "no duplicated files")
    assert(after.rows == before.rows, "no double-counted rows")
    assert(table.read(Some(s3)).count() == 100)
  }

  test("append chain with evolved schema reads as union with nulls") {
    import org.apache.spark.sql.functions._
    val root = tmpRoot("append-evolve")
    val table = new IceTable(root, spark)
    val df1 = spark.range(0, 40).select(col("id"),
      pmod(col("id"), lit(4)).cast("int").as("bucket"),
      lit(null).cast("string").as("error"), lit("t").as("text"))
    table.commitAppend(df1, "e0")
    // the second append ADDS a column: the chained read must be the
    // union schema with nulls where the older commit predates it
    // (Iceberg schema evolution), not a generic unionByName failure
    val s = table.commitAppend(df1.withColumn("lang", lit("en")), "e1")
    val out = table.read(Some(s))
    assert(out.count() == 80)
    assert(out.columns.contains("lang"))
    assert(out.filter(col("lang").isNull).count() == 40)
    assert(out.filter(col("lang") === "en").count() == 40)
  }

  test("manifest file stats: range read prunes micro-batch commits from metadata") {
    import org.apache.spark.sql.functions._
    val root = tmpRoot("stats")
    val table = new IceTable(root, spark)
    def batch(lo: Long): org.apache.spark.sql.DataFrame =
      spark.range(lo, lo + 1000).select(col("id").as("seq"),
        pmod(col("id"), lit(4)).cast("int").as("bucket"),
        lit(null).cast("string").as("error"), lit("t").as("text"))
    // batch 0 predates stats (legacy manifest entries — must never be
    // pruned); batches 1-3 record per-file seq min/max
    table.commitAppend(batch(0), "b0")
    (1 to 3).foreach(i => table.commitAppend(batch(i * 1000L), s"b$i",
      statsCol = Some("seq")))
    val snap = table.readSnapshot(table.currentSnapshotId.get)
    val (legacy, withStats) = snap.files.partition(_.path.contains("/commit-b0/"))
    assert(legacy.nonEmpty && legacy.forall(_.statsMin.isEmpty))
    assert(withStats.nonEmpty && withStats.forall(f =>
      f.statsMin.isDefined && f.statsMax.isDefined && f.statsMin.get <= f.statsMax.get))
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.inputFiles.length
      }.sum
    // a slice inside batch 2: exactly the files whose recorded
    // [min,max] overlap the slice plus the stats-less legacy files may
    // be opened — batches 1/3 prune away entirely, and WITHIN batch 2
    // the per-file stats prune the non-overlapping range partitions too
    val sliced = table.readRange("seq", 2100, 2199)
    val expectOpen = legacy.length + withStats.count(f =>
      f.statsMax.get >= 2100 && f.statsMin.get <= 2199)
    assert(scannedFiles(sliced) == expectOpen,
      s"scanned ${scannedFiles(sliced)}, expected $expectOpen of ${snap.files.length}")
    assert(withStats.count(f => f.statsMax.get >= 2100 && f.statsMin.get <= 2199) <
      withStats.count(_.path.contains("/commit-b2/")),
      "per-file stats must prune finer than whole commits")
    assert(scannedFiles(sliced) < snap.files.length)
    // and the rows equal the unpruned filter exactly
    val want = table.read().filter(col("seq").between(2100, 2199))
      .select("seq").collect().map(_.getLong(0)).sorted
    val got = sliced.select("seq").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want) && got.length == 100)
    // a slice matching nothing reads no files at all
    assert(table.readRange("seq", 100000, 200000).isEmpty)
  }

  test("incremental read yields each append delta exactly once; rollback is append-only") {
    import org.apache.spark.sql.functions._
    val root = tmpRoot("incr")
    val table = new IceTable(root, spark)
    def batch(lo: Long, n: Long): org.apache.spark.sql.DataFrame =
      spark.range(lo, lo + n).select(col("id").as("seq"),
        pmod(col("id"), lit(4)).cast("int").as("bucket"),
        lit(null).cast("string").as("error"), lit("t").as("text"))
    val s0 = table.commitAppend(batch(0, 100), "i0")
    val s1 = table.commitAppend(batch(100, 50), "i1")
    val s2 = table.commitAppend(batch(150, 30), "i2")
    // each delta surfaces exactly its own batch's rows
    val d1 = table.readIncremental(s0, s1).select("seq").collect()
      .map(_.getLong(0)).sorted
    assert(d1.sameElements(100L until 150L), s"delta1 ${d1.length} rows")
    val d2 = table.readIncremental(s1, s2).select("seq").collect()
      .map(_.getLong(0)).sorted
    assert(d2.sameElements(150L until 180L))
    // chained deltas + the base reconstruct the full table, no overlap
    assert(table.readIncremental(s0, s2).count() == 80)
    assert(table.readIncremental(s2, s2).isEmpty)
    // rollback: a NEW snapshot re-reads s1's state; history append-only
    val s3 = table.rollback(s1)
    assert(s3 > s2)
    assert(table.read().count() == 150)
    assert(table.read(Some(s2)).count() == 180, "abandoned snapshot stays travelable")
    assert(table.lineage().collect().map(_.getAs[Long]("rows")).sum > 0)
  }

  test("two racing committers: never a lost snapshot; loser's data expirable") {
    import org.apache.spark.sql.functions._
    val root = tmpRoot("race")
    val df = spark.range(0, 30).select(col("id"),
      pmod(col("id"), lit(2)).cast("int").as("bucket"),
      lit(null).cast("string").as("error"), lit("t").as("text"))
    // Two committers start on a barrier. Legal outcomes: (a) they
    // overlap → one wins snap-0, the other throws
    // ConcurrentCommitException (the usual case — the data-write phase
    // dominates, so the parent reads overlap); (b) one finishes
    // entirely before the other flips → both land, snapshots 0 and 1.
    // What must NEVER happen is the POSIX-rename trap: both "succeed"
    // while one manifest was silently overwritten. The deterministic
    // CAS-primitive test lives in IceTableCasSpec.
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentHashMap[String, Either[Throwable, Long]]()
    val threads = Seq("racer-a", "racer-b").map { id =>
      new Thread(() => {
        val t = new IceTable(root, spark) // each committer its own handle
        barrier.await()
        try results.put(id, Right(t.commit(df, id, groups = 1)))
        catch { case e: Throwable => results.put(id, Left(e)) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(180000))
    val outcome = Seq("racer-a", "racer-b").map(id => id -> results.get(id)).toMap
    val winners = outcome.collect { case (id, Right(snap)) => id -> snap }
    val losers = outcome.collect { case (id, Left(e)) => id -> e }
    val table = new IceTable(root, spark)
    // every snapshot that reports success must exist with ITS OWN
    // commit — a silently overwritten manifest fails here
    winners.foreach { case (id, snap) =>
      assert(table.readSnapshot(snap).commitId == id,
        s"committer $id reported snap $snap but the manifest belongs to " +
          table.readSnapshot(snap).commitId)
    }
    assert(winners.nonEmpty, s"at least one commit must land: $outcome")
    assert(table.read().count() == 30)
    if (losers.nonEmpty) {
      val (loserId, e) = losers.head
      assert(e.isInstanceOf[IceTable.ConcurrentCommitException], s"loser: $e")
      // the loser's data dir is referenced by NO snapshot → expirable
      assert(table.snapshots.map(table.readSnapshot).forall(
        s => !s.files.exists(_.path.contains(s"commit-$loserId/"))))
      // and a plain RETRY lands: group markers skip the data rewrite
      val retried = table.commit(df, loserId, groups = 1)
      assert(retried == table.snapshots.max && table.read().count() == 30)
    }
  }

  test("snapshot schema: recorded per commit, validated on read, evolvable") {
    import org.apache.spark.sql.functions._
    val root = tmpRoot("schema")
    val table = new IceTable(root, spark)
    val df1 = spark.range(0, 100).select(col("id"),
      pmod(col("id"), lit(4)).cast("int").as("bucket"),
      lit(null).cast("string").as("error"), lit("t").as("text"))
    val s1 = table.commit(df1, "schema-1", groups = 2)
    // a later commit ADDS a column — snapshots keep their own schema
    // (per-commit data dirs), so time travel returns the old shape
    val s2 = table.commit(df1.withColumn("lang", lit("en")), "schema-2", groups = 2)
    assert(table.schemaOf(s1).get.toSet == Set("id", "bucket", "error", "text"))
    assert(table.schemaOf(s2).get.contains("lang"))
    assert(!table.read(Some(s1)).columns.contains("lang"))
    assert(table.read(Some(s2)).columns.contains("lang"))
    assert(table.read(Some(s2)).count() == 100)
  }
}
