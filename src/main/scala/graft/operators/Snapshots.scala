package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** TSDB snapshots — the third upstream admin endpoint
  * (`/api/v1/admin/tsdb/snapshot`, prometheus/prometheus web/api/v1): a
  * point-in-time, restore-ready copy of the store published
  * crash-atomically under `<snapRoot>/<id>/<store>/...`.
  *
  * Like upstream (which hardlinks blocks into `data/snapshots/<id>`), the
  * copy is O(files), not O(bytes), wherever the filesystem allows it:
  * every data file is HARDLINKED when source and snapshot root live on
  * the same local filesystem — at 100 TB a byte copy is not a snapshot
  * operation, and parquet files here are immutable-once-published exactly
  * like TSDB blocks (compaction/purge REPLACE files via rename, never
  * rewrite in place, so a hardlinked snapshot stays frozen while the live
  * store moves on). Filesystems without link support (HDFS-like) fall
  * back to a real copy, documented and still correct.
  *
  * Crash protocol: stage into `_tmp-<id>`, stamp `_SUCCESS`, rename to
  * `<id>` — the same publish pattern as the hwm base and the purge swap.
  * A crashed attempt leaves only an underscore-hidden tmp dir that the
  * next snapshot sweeps. Restore = point the engine at
  * `<snapRoot>/<id>/<store>` (read-only) or copy it back.
  *
  * Transient coordination state is excluded: `_claims` (batch-id claim
  * files), `_spool` (acked-but-undrained writes — they are not yet part
  * of the queryable store), and `_tmp-*`/`_old-*` staging dirs.
  */
object Snapshots {

  private def fsFor(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val Excluded = Seq("_claims", "_spool")

  private def excluded(name: String): Boolean =
    Excluded.contains(name) || name.startsWith("_tmp-") ||
      name.startsWith("_old-") || name.startsWith("_snapshots") ||
      name == "snapshots"

  /** Create a snapshot of `stores` (name -> directory; missing dirs are
    * skipped) under `snapRoot`; returns the published snapshot id. */
  def create(spark: SparkSession, snapRoot: String,
             stores: Seq[(String, String)]): String = {
    val fs = fsFor(spark, snapRoot)
    val root = new Path(snapRoot)
    fs.mkdirs(root)
    // sweep staging leftovers of crashed attempts (never published ids)
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("_tmp-"))
      .foreach(fs.delete(_, true))
    val stamp = new java.text.SimpleDateFormat("yyyyMMdd'T'HHmmss'Z'")
    stamp.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val id = stamp.format(new java.util.Date()) + "-" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val tmp = new Path(root, s"_tmp-$id")
    var linked = 0L; var copied = 0L
    stores.foreach { case (name, dir) =>
      val src = new Path(dir)
      val srcFs = fsFor(spark, dir)
      if (srcFs.exists(src)) {
        val (l, c) = snapshotTree(srcFs, src, fs, new Path(tmp, name))
        linked += l; copied += c
      }
    }
    val ok = fs.create(new Path(tmp, "_SUCCESS"), true)
    try ok.write(s"""{"linked":$linked,"copied":$copied}""".getBytes("UTF-8"))
    finally ok.close()
    if (!fs.rename(tmp, new Path(root, id)))
      throw new IllegalStateException(s"snapshot publish failed: $id")
    id
  }

  /** Recursively link-or-copy `src` under `dst`; returns (linked, copied)
    * file counts. */
  private def snapshotTree(srcFs: FileSystem, src: Path,
                           dstFs: FileSystem, dst: Path): (Long, Long) = {
    var linked = 0L; var copied = 0L
    dstFs.mkdirs(dst)
    srcFs.listStatus(src).foreach { st =>
      val name = st.getPath.getName
      if (!excluded(name)) {
        val target = new Path(dst, name)
        if (st.isDirectory) {
          val (l, c) = snapshotTree(srcFs, st.getPath, dstFs, target)
          linked += l; copied += c
        } else {
          if (tryHardlink(srcFs, st.getPath, dstFs, target)) linked += 1
          else {
            org.apache.hadoop.fs.FileUtil.copy(srcFs, st.getPath,
              dstFs, target, false, srcFs.getConf)
            copied += 1
          }
        }
      }
    }
    (linked, copied)
  }

  /** Hardlink when both paths are plain local files (file: scheme or
    * RawLocal/LocalFileSystem); anything else falls back to copy. */
  private def tryHardlink(srcFs: FileSystem, src: Path,
                          dstFs: FileSystem, dst: Path): Boolean = {
    def localPath(fs: FileSystem, p: Path): Option[java.nio.file.Path] = {
      val q = fs.makeQualified(p).toUri
      if (q.getScheme == null || q.getScheme == "file")
        Some(java.nio.file.Paths.get(q.getPath))
      else None
    }
    (localPath(srcFs, src), localPath(dstFs, dst)) match {
      case (Some(s), Some(d)) =>
        try { java.nio.file.Files.createLink(d, s); true }
        catch { case _: Exception => false }
      case _ => false
    }
  }

  /** Published snapshot ids, newest last (lexicographic = chronological
    * for the timestamp-prefixed naming). */
  def list(spark: SparkSession, snapRoot: String): Seq[String] = {
    val fs = fsFor(spark, snapRoot)
    val root = new Path(snapRoot)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .sorted.toSeq
  }
}
