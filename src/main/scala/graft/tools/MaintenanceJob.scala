package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession
import graft.streaming.Ingest

/** One-entrypoint maintenance orchestrator for a remote-write sink's LSM
  * family — the reference runs the analogous folds as its housekeeping
  * tasks inside the ingesting node; here they are a batch job an operator
  * (or cron) points at the sink root:
  *
  *   - series-index `_hwm` base fold            (Ingest.compactHwm)
  *   - exp-histogram cumulative-state base fold (Ingest.compactExpState)
  *   - exemplar side-table base fold            (Ingest.compactExemplars)
  *   - metric-metadata version GC               (keep newest 2 committed)
  *   - delete_series tombstone purge            (Tombstones.purge)
  *   - batch-granularity retention drop         (Ingest.dropSinkOlderThan)
  *   - samples-sink batch-dir compaction        (Ingest.compactSink)
  *   - spool quarantine sweep                   (.abandoned/.bad past age)
  *   - stale staging-dir sweep                  (_tmp-* past age)
  *
  * SINGLE-COMPACTOR CONTRACT, made structural: every fold here assumes at
  * most one compactor per sink at a time (the bases' atomic rename
  * publishes tolerate crashes, not concurrent sibling folds consuming the
  * same delta dirs). The job takes a coarse per-sink LOCK FILE
  * (`<sink>/_maintenance.lock`, exclusive-create — the one atomic
  * primitive HDFS and POSIX both give) before touching anything; a second
  * instance finding a FRESH lock no-ops loudly (exit code 0 — cron should
  * not page) and a lock older than `lockStaleMs` is a crashed
  * predecessor's leftover, broken and re-taken. The write-path's own
  * periodic `hwmCompactEvery` folds run inside the API's commitLock, so
  * pausing the API (or pointing this job at a sink with
  * hwmCompactEvery=0) is still required for strict single-compactor
  * operation — the lock serializes MAINTENANCE instances, which is the
  * contract that was previously documentation only.
  *
  * Usage: MaintenanceJob <sinkDir> <indexDir>
  *          [--exemplars=<dir>] [--metadata=<dir>]
  *          [--quarantine-age-ms=N] [--lock-stale-ms=N]
  */
object MaintenanceJob {

  /** What ran: (step, "ok" | "skipped: why" | "failed: msg"). `locked` =
    * false means another instance held the lock and nothing ran. */
  case class Report(locked: Boolean, steps: Seq[(String, String)])

  def run(spark: SparkSession, sinkDir: String, indexDir: String,
          exemplarDir: Option[String] = None,
          metadataDir: Option[String] = None,
          adminDir: Option[String] = None,
          retentionMs: Option[Long] = None,
          snapshotKeep: Option[Int] = None,
          quarantineMaxAgeMs: Long = 24L * 3600 * 1000,
          lockStaleMs: Long = 3600L * 1000,
          sinkCompactMin: Int = 8,
          nowMs: Long = System.currentTimeMillis()): Report = {
    val fs = new org.apache.hadoop.fs.Path(sinkDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(sinkDir))
    val lock = new org.apache.hadoop.fs.Path(s"$sinkDir/_maintenance.lock")
    def takeLock(): Boolean =
      fs.createNewFile(lock) || {
        // a stale lock is a crashed predecessor: break it once, retry once
        val st = try Some(fs.getFileStatus(lock)) catch { case _: Exception => None }
        st.exists(s => nowMs - s.getModificationTime > lockStaleMs) &&
          fs.delete(lock, false) && fs.createNewFile(lock)
      }
    if (!takeLock()) return Report(locked = false, Nil)
    val steps = Seq.newBuilder[(String, String)]
    def step(name: String)(body: => Unit): Unit =
      steps += name -> (try { body; "ok" }
        catch { case e: Exception => s"failed: ${e.getMessage}" })
    try {
      step("hwm_base_fold") { Ingest.compactHwm(spark, indexDir) }
      step("exp_state_fold") { Ingest.compactExpState(spark, s"$indexDir/_exp_state") }
      exemplarDir match {
        case Some(d) => step("exemplar_fold") { Ingest.compactExemplars(spark, d) }
        case None => steps += "exemplar_fold" -> "skipped: no dir configured"
      }
      metadataDir match {
        case Some(d) => step("metadata_version_gc") { metadataVersionGc(fs, d) }
        case None => steps += "metadata_version_gc" -> "skipped: no dir configured"
      }
      retentionMs match {
        case Some(r) => step("retention_drop") {
          // age out whole expired batch partitions (directory deletes,
          // never rewrites); index hwm stays, so ancient replays still dedup
          val dropped = Ingest.dropSinkOlderThan(spark, sinkDir, nowMs - r)
          if (dropped.nonEmpty)
            println(s"[maintenance] retention dropped: ${dropped.mkString(", ")}")
        }
        case None => steps += "retention_drop" -> "skipped: no retention configured"
      }
      adminDir match {
        case Some(d) => step("tombstone_purge") {
          // delete_series tombstones made physical (clean_tombstones
          // analogue): crash-repair first, then rewrite only the batch
          // partitions holding matching rows, then consume the records
          graft.operators.Tombstones.purge(spark, sinkDir, d)
        }
        case None => steps += "tombstone_purge" -> "skipped: no dir configured"
      }
      step("sink_batch_compaction") {
        // fold old per-window batch dirs into one consolidated dir (the
        // small-file killer at drain cadence); runs AFTER retention and
        // the tombstone purge so it folds only surviving, already-clean
        // dirs. compactSink itself repairs any crashed prior swap first.
        Ingest.compactSink(spark, sinkDir, minBatches = sinkCompactMin)
          .foreach { case (n, files) =>
            println(s"[maintenance] sink compaction folded $n batch dirs -> $files files") }
      }
      snapshotKeep match {
        case Some(k) => step("snapshot_retention") {
          // hardlinked snapshots unlink cheaply; runs under the same
          // per-sink maintenance lock as every other fold, so it never
          // races another instance's sweep (the API's own snapshot POST
          // creates only, never deletes published ids)
          val dropped = graft.operators.Snapshots.retain(
            spark, graft.http.PromApi.snapshotRoot(sinkDir), k)
          if (dropped.nonEmpty)
            println(s"[maintenance] snapshot retention dropped: ${dropped.mkString(", ")}")
        }
        case None => steps += "snapshot_retention" -> "skipped: no keep count configured"
      }
      step("spool_quarantine_sweep") {
        sweepSuffixes(fs, s"$sinkDir/_spool",
          Seq(".abandoned", ".bad"), quarantineMaxAgeMs, nowMs)
      }
      step("staging_sweep") {
        // crashed publishers' hidden staging dirs (underscore-prefixed, so
        // no reader ever trusts them) — age-gated so a LIVE publisher's
        // in-flight staging dir is never yanked out from under it
        (Seq(sinkDir, indexDir, s"$indexDir/_exp_state") ++ exemplarDir ++ metadataDir)
          .foreach(d => sweepStaging(fs, d, quarantineMaxAgeMs, nowMs))
      }
    } finally fs.delete(lock, false)
    Report(locked = true, steps.result())
  }

  /** Keep the newest 2 COMMITTED metadata versions (the upsert's own GC
    * grace); sweep older ones a crashed upsert may have left behind. */
  private def metadataVersionGc(fs: org.apache.hadoop.fs.FileSystem,
                                dir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return
    val versions = fs.listStatus(root).map(_.getPath)
      .flatMap(p => p.getName.stripPrefix("v=").toLongOption.map(_ -> p))
      .filter { case (_, p) =>
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) }
      .sortBy(-_._1)
    versions.drop(2).foreach { case (_, p) => fs.delete(p, true) }
  }

  private def sweepSuffixes(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                            suffixes: Seq[String], maxAgeMs: Long,
                            nowMs: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (suffixes.exists(n.endsWith) && nowMs - st.getModificationTime > maxAgeMs)
        fs.delete(st.getPath, false)
    }
  }

  private def sweepStaging(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                           maxAgeMs: Long, nowMs: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { st =>
      if (st.getPath.getName.startsWith("_tmp-") &&
          nowMs - st.getModificationTime > maxAgeMs)
        fs.delete(st.getPath, true)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: MaintenanceJob <sinkDir> <indexDir> [--exemplars=d] " +
        "[--metadata=d] [--admin=d] [--retention-ms=N] [--snapshot-keep=N] " +
        "[--quarantine-age-ms=N] [--lock-stale-ms=N] [--sink-compact-min=N]")
    def opt(name: String): Option[String] =
      args.collectFirst { case a if a.startsWith(s"--$name=") =>
        a.stripPrefix(s"--$name=") }
    val spark = GraftSession.builder("local[*]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = run(spark, args(0), args(1),
      exemplarDir = opt("exemplars"), metadataDir = opt("metadata"),
      adminDir = opt("admin"),
      retentionMs = opt("retention-ms").map(_.toLong),
      snapshotKeep = opt("snapshot-keep").map(_.toInt),
      quarantineMaxAgeMs = opt("quarantine-age-ms").map(_.toLong)
        .getOrElse(24L * 3600 * 1000),
      lockStaleMs = opt("lock-stale-ms").map(_.toLong).getOrElse(3600L * 1000),
      sinkCompactMin = opt("sink-compact-min").map(_.toInt).getOrElse(8))
    if (!report.locked)
      println(s"[maintenance] another instance holds ${args(0)}/_maintenance.lock; no-op")
    else report.steps.foreach { case (s, r) => println(s"[maintenance] $s: $r") }
    spark.stop()
    sys.exit(0) // non-daemon threads must not park the JVM (tool-main rule)
  }
}
