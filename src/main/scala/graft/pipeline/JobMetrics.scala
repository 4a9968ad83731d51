package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Job-level progress + event-log analogue of the reference's
  * incremental reporting:
  *   - per-page progress signal (main_window.py:294,383) →
  *     a LongAccumulator incremented per extracted row + SparkListener
  *     task counters (SURVEY.md §2.9 ST1, §2.4 A4);
  *   - elapsed-time metric (main_window.py:728,751) → wall-clock row
  *     (A5);
  *   - user-event log (event_log.py:4-8) → append-only ISO-timestamped
  *     event lines written next to the table metadata (S9);
  *   - status heartbeat e-mail (main_window.py:417-419) → a status
  *     event per job completion instead of SMTP (ST4; transport is a
  *     documented non-goal, SURVEY.md §7.7).
  */
final class JobMetrics(spark: SparkSession, name: String) {

  val rowsProcessed: LongAccumulator = spark.sparkContext.longAccumulator(s"$name.rows")
  val errorRows: LongAccumulator = spark.sparkContext.longAccumulator(s"$name.errors")
  val oversizeDocs: LongAccumulator = spark.sparkContext.longAccumulator(s"$name.oversize")

  @volatile private var tasksCompleted = 0L
  @volatile private var stagesCompleted = 0L
  private val t0 = System.nanoTime()

  private val listener = new SparkListener {
    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
      tasksCompleted += 1
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      stagesCompleted += 1
  }
  spark.sparkContext.addSparkListener(listener)

  def elapsedSec: Double = (System.nanoTime() - t0) / 1e9

  /** One status line, reference event-log format: ISO timestamp + text
    * (event_log.py:7 `datetime.now().isoformat()`). */
  def statusLine(event: String): String = {
    val ts = java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
    f"$ts [$name] $event rows=${rowsProcessed.value} errors=${errorRows.value} " +
      f"oversize=${oversizeDocs.value} tasks=$tasksCompleted stages=$stagesCompleted " +
      f"elapsed=${elapsedSec}%.2fs"
  }

  private val eventSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Append an event to the job's event log (append-only audit rows —
    * S8/S9). One immutable file per event (HDFS-append is not portable;
    * an append-only *directory* is the cloud-storage idiom), read back
    * in order via readEventLog. */
  def logEvent(fsRoot: String, event: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(fsRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(fsRoot, "metadata/events")
    fs.mkdirs(dir)
    val p = new org.apache.hadoop.fs.Path(dir,
      f"ev-${System.currentTimeMillis()}%013d-${eventSeq.getAndIncrement()}%04d-$name.log")
    val out = fs.create(p, false)
    out.write((statusLine(event) + "\n").getBytes("UTF-8"))
    out.close()
  }

  /** All event lines of a table root, in append order. */
  def readEventLog(fsRoot: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(fsRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(fsRoot, "metadata/events")
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.map(_.getPath).sortBy(_.getName).map { p =>
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
  }

  def close(): Unit = spark.sparkContext.removeSparkListener(listener)
}
