package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.promql.{Matchers, Parser, Selector}

/** Deletion tombstones — the engine's analogue of the upstream Prometheus
  * TSDB admin API pair (`/api/v1/admin/tsdb/delete_series` +
  * `clean_tombstones`): a delete request is recorded as a tiny tombstone
  * file (selectors + time range) that every query applies as a NEGATED,
  * pushdown-friendly predicate; the expensive physical rewrite happens
  * later, in maintenance, against only the partitions that actually hold
  * matching rows. At 100 TB this is the only workable shape — a delete
  * must not rewrite the store synchronously, and a handful of compiled
  * predicates on (metric, tags, ts) costs nothing per query while parquet
  * row-group stats prune the untouched bulk.
  *
  * The reference has no user-facing delete surface (its retention drops
  * whole time slices — TsLayout.dropOlderThan covers that); this follows
  * the upstream prometheus/prometheus tsdb tombstone design instead
  * (public docs: web/api/v1 admin endpoints, tsdb/tombstones.go).
  *
  * File format (one record per file, `del-<id>.tomb`, atomic tmp+rename):
  * line 1 = `<startMs> <endMs>`, each further line = one raw PromQL
  * series selector exactly as received in `match[]`.
  */
object Tombstones {

  final case class DeleteRecord(file: String, startMs: Long, endMs: Long,
                                selectors: Seq[String])

  /** Parse + validate one selector string (must be a plain instant series
    * selector with at least one concrete matcher, like upstream's
    * `parseMetricSelector`). Returns the AST for predicate compilation. */
  def parseSelector(raw: String): Selector = Parser.parse(raw) match {
    case s: Selector if s.windowMs.isEmpty && s.windowSteps.isEmpty &&
        s.offsetMs == 0L && s.atMs.isEmpty &&
        (s.metric.nonEmpty || s.matchers.nonEmpty) =>
      s
    case _: Selector => throw new IllegalArgumentException(
      s"delete_series match[] must be a plain series selector (no range, " +
        s"offset or @): '$raw'")
    case _ => throw new IllegalArgumentException(
      s"delete_series match[] must be a series selector, got: '$raw'")
  }

  /** The DROP predicate of one selector over the canonical
    * (metric, tags, ts) sample columns — null-safe (a missing tag makes
    * the conjunct false, never null, so the later negation keeps the
    * row). */
  private def selPred(sel: Selector): Column = {
    val conj = sel.metric.map(m => col("metric") === m).toSeq ++
      sel.matchers.map(Matchers.pred)
    coalesce(conj.reduce(_ && _), lit(false))
  }

  private def recPred(r: DeleteRecord): Column =
    r.selectors.map(s => selPred(parseSelector(s))).reduce(_ || _) &&
      col("ts") >= r.startMs && col("ts") <= r.endMs

  /** Combined drop predicate for a set of records (None when empty). */
  def dropPredicate(records: Seq[DeleteRecord]): Option[Column] =
    if (records.isEmpty) None
    else Some(records.map(r => coalesce(recPred(r), lit(false))).reduce(_ || _))

  /** Hide tombstoned rows from a samples frame. The negated predicate is
    * NOT a pushable parquet filter (NOT over a null-guarded disjunction
    * evaluates post-scan), but it is a flat per-row expression over three
    * already-read columns — the scan itself is shaped by the QUERY's own
    * pushed filters; the tombstone check adds no I/O and no shuffle. */
  def applyTo(df: DataFrame, records: Seq[DeleteRecord]): DataFrame =
    dropPredicate(records).map(p => df.filter(!p)).getOrElse(df)

  /** Drop predicate for per-SERIES rows (a series index / metadata frame
    * with `start_ts`/`end_ts` bounds): a series disappears only when some
    * record's selectors match AND the record's time range covers the
    * series' ENTIRE indexed span — a partially-deleted series still has
    * live samples and must stay visible to /series and label metadata. */
  def seriesDropPredicate(records: Seq[DeleteRecord]): Option[Column] =
    if (records.isEmpty) None
    else Some(records.map { r =>
      coalesce(
        r.selectors.map(s => selPred(parseSelector(s))).reduce(_ || _) &&
          col("start_ts") >= r.startMs && col("end_ts") <= r.endMs,
        lit(false))
    }.reduce(_ || _))

  /** Hide fully-tombstoned series from an index/metadata frame. */
  def applyToIndex(idx: DataFrame, records: Seq[DeleteRecord]): DataFrame =
    seriesDropPredicate(records).map(p => idx.filter(!p)).getOrElse(idx)

  /** Hide tombstoned rows from EVERY frame a planner context reads — the
    * raw samples and any registered downsample tier (library contexts;
    * [[graft.http.PromApi]] filters its own serving frame). A tier frame
    * that does not carry the canonical (metric, tags, ts) triple cannot
    * be matched by selector tombstones and passes through unchanged —
    * callers with renamed tier columns must filter those themselves. */
  def applyToCtx(ctx: graft.promql.PromPlanner.Ctx,
                 records: Seq[DeleteRecord]): graft.promql.PromPlanner.Ctx =
    dropPredicate(records) match {
      case None => ctx
      case Some(p) =>
        def f(df: DataFrame): DataFrame =
          if (Seq("metric", "tags", "ts").forall(df.columns.contains))
            df.filter(!p)
          else df
        ctx.copy(samples = f(ctx.samples),
          cold = ctx.cold.map(c => c.copy(ds = f(c.ds))))
    }

  // ----- registry I/O (driver-side; records are rare and tiny) -----

  private def fsFor(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Record one delete request crash-atomically; returns the file name.
    * Selectors are validated BEFORE anything is written — a bad matcher
    * must 400, not poison every later query. */
  def write(spark: SparkSession, dir: String, selectors: Seq[String],
            startMs: Long, endMs: Long): String = {
    require(selectors.nonEmpty, "delete_series needs at least one match[]")
    selectors.foreach(parseSelector)
    val fs = fsFor(spark, dir)
    fs.mkdirs(new Path(dir))
    val id = java.util.UUID.randomUUID().toString.take(12)
    val name = s"del-$id.tomb"
    val tmp = new Path(dir, s"_tmp-$name")
    val out = fs.create(tmp, true)
    try out.write((s"$startMs $endMs\n" + selectors.mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, new Path(dir, name)))
      throw new IllegalStateException(s"tombstone publish failed: $name")
    name
  }

  /** Just the committed tombstone file names — the cheap change-detection
    * probe a caller uses to decide whether to re-read record bodies. */
  def listNames(spark: SparkSession, dir: String): Set[String] = {
    val fs = fsFor(spark, dir)
    val root = new Path(dir)
    if (!fs.exists(root)) return Set.empty
    fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("del-") && n.endsWith(".tomb")).toSet
  }

  /** All committed tombstone records, name-ordered (deterministic). */
  def list(spark: SparkSession, dir: String): Seq[DeleteRecord] = {
    val fs = fsFor(spark, dir)
    val root = new Path(dir)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("del-") && p.getName.endsWith(".tomb"))
      .sortBy(_.getName).toSeq
      .map { p =>
        val in = fs.open(p)
        val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        val lines = text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        val Array(s, e) = lines.head.split(" ", 2)
        DeleteRecord(p.getName, s.toLong, e.toLong, lines.tail)
      }
  }

  /** Physically drop tombstoned rows from a `batch_id=N`-partitioned sink
    * (the remote-write commit layout) and consume the applied tombstone
    * files — upstream `clean_tombstones`.
    *
    * Only partitions that actually HOLD matching rows are rewritten (one
    * cheap distinct over the drop predicate finds them; row-group stats
    * prune the rest of the scan). Each rewrite is a crash-repairable
    * three-rename swap, per partition:
    *   1. kept rows -> `_tmp-clean-<N>` (underscore-hidden from readers)
    *   2. `batch_id=N` -> `_old-clean-<N>`   (atomic: partition vanishes)
    *   3. `_tmp-clean-<N>` -> `batch_id=N`   (atomic: cleaned appears)
    *   4. delete `_old-clean-<N>`
    * A crash between 2 and 3 leaves both underscore dirs; [[repair]] (run
    * first, every time) completes the swap forward if the staged dir is
    * complete, else rolls the old partition back — either way the
    * partition is never half-visible, the exact pattern the write spool
    * uses. Tombstone files are deleted only after EVERY affected
    * partition swapped, so a crash mid-purge re-applies (idempotent:
    * re-filtering already-clean rows drops nothing).
    *
    * CONTAINMENT CONTRACT: consuming a tombstone asserts the purge saw
    * every row it hides — so `sinkDir` must be THE store the serving
    * samples frame reads (when the admin API is enabled, [[graft.http
    * .PromApi]]'s `samples` must read `writeSink.sinkDir`; its
    * clean_tombstones handler refuses the purge when the frame provably
    * reads other files). Purging one store while serving reads another
    * would resurrect matching rows in the other store the moment the
    * tombstone files are consumed (r13 advisor finding).
    */
  def purge(spark: SparkSession, sinkDir: String, adminDir: String): Int = {
    repair(spark, sinkDir)
    val records = list(spark, adminDir)
    val drop = dropPredicate(records).getOrElse(return 0)
    val fs = fsFor(spark, sinkDir)
    val df = spark.read.option("mergeSchema", "true").parquet(sinkDir)
    if (!df.columns.contains("batch_id"))
      throw new IllegalArgumentException(
        s"$sinkDir is not a batch_id-partitioned sink")
    val affected = df.filter(drop).select("batch_id").distinct()
      .collect().map(_.get(0).toString).sorted
    affected.foreach { b =>
      val part = new Path(sinkDir, s"batch_id=$b")
      val tmp = new Path(sinkDir, s"_tmp-clean-$b")
      val old = new Path(sinkDir, s"_old-clean-$b")
      // preserve the partition layout INSIDE the batch dir (the
      // remote-write sink nests metric=<m> under each batch) — a flat
      // rewrite would make batch dirs conflict at the next read
      val inner = innerPartitionCols(fs, part)
      spark.read.option("mergeSchema", "true").parquet(part.toString)
        .filter(!drop).write.mode("overwrite")
        .partitionBy(inner: _*).parquet(tmp.toString)
      if (!fs.rename(part, old))
        throw new IllegalStateException(s"purge swap-out failed: $part")
      if (!fs.rename(tmp, part))
        throw new IllegalStateException(s"purge swap-in failed: $part")
      fs.delete(old, true)
    }
    // tombstone files live in adminDir, which may be a different
    // filesystem than the store — delete via its own FS handle
    val adminFs = fsFor(spark, adminDir)
    records.foreach(r => adminFs.delete(new Path(adminDir, r.file), false))
    affected.length
  }

  /** Selector purge for the `metric=<m>/date=<d>` [[graft.model.TsLayout]]
    * layout (date-partitioned stores previously had retention —
    * whole-directory deletes — but no selector-delete): the same
    * hide-now/purge-later contract as [[purge]], with one (metric, date)
    * LEAF partition as the rewrite unit and the same crash-repairable
    * three-rename swap (staged as `_old-clean-<d>`/`_tmp-clean-<d>`
    * INSIDE the metric directory; [[repairTsLayout]] completes or rolls
    * back). Affected leaves are found by one distinct over the drop
    * predicate — partition pruning on `metric` keeps that scan narrow,
    * and only leaves actually holding matching rows are rewritten, so the
    * cost tracks the data deleted, not the store size. Leaf files do not
    * carry the partition columns, so the predicate evaluates with them
    * re-attached as literals. */
  def purgeTsLayout(spark: SparkSession, path: String, adminDir: String): Int = {
    repairTsLayout(spark, path)
    val records = list(spark, adminDir)
    val drop = dropPredicate(records).getOrElse(return 0)
    val fs = fsFor(spark, path)
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    require(df.columns.contains("date") && df.columns.contains("metric"),
      s"$path is not a metric=/date= partitioned TsLayout store")
    val affected = df.filter(drop)
      .select(col("metric").cast("string"), col("date").cast("string"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1))).sorted
    affected.foreach { case (m, d) =>
      val metricDir = new Path(path, s"metric=$m")
      val part = new Path(metricDir, s"date=$d")
      val tmp = new Path(metricDir, s"_tmp-clean-$d")
      val old = new Path(metricDir, s"_old-clean-$d")
      spark.read.parquet(part.toString)
        .withColumn("metric", lit(m))
        .withColumn("date", lit(d))
        .filter(!drop)
        .drop("metric", "date")
        .write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(part, old))
        throw new IllegalStateException(s"purge swap-out failed: $part")
      if (!fs.rename(tmp, part))
        throw new IllegalStateException(s"purge swap-in failed: $part")
      fs.delete(old, true)
    }
    val adminFs = fsFor(spark, adminDir)
    records.foreach(r => adminFs.delete(new Path(adminDir, r.file), false))
    affected.length
  }

  /** Layout dispatch for offline admin: `batch_id=` sinks take [[purge]],
    * `metric=/date=` TsLayout stores take [[purgeTsLayout]]. */
  def purgeAny(spark: SparkSession, path: String, adminDir: String): Int = {
    val cols = spark.read.option("mergeSchema", "true").parquet(path).columns
    if (cols.contains("batch_id")) purge(spark, path, adminDir)
    else purgeTsLayout(spark, path, adminDir)
  }

  /** [[repair]]'s twin for the TsLayout leaf swaps: complete or roll back
    * any crashed `_old-clean-<d>` under every `metric=` directory. */
  def repairTsLayout(spark: SparkSession, path: String): Unit = {
    val fs = fsFor(spark, path)
    val root = new Path(path)
    if (!fs.exists(root)) return
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("metric=")).foreach { metricDir =>
        fs.listStatus(metricDir).map(_.getPath)
          .filter(_.getName.startsWith("_old-clean-")).foreach { old =>
            val d = old.getName.stripPrefix("_old-clean-")
            val part = new Path(metricDir, s"date=$d")
            val tmp = new Path(metricDir, s"_tmp-clean-$d")
            if (fs.exists(part)) fs.delete(old, true)
            else if (fs.exists(new Path(tmp, "_SUCCESS"))) {
              if (fs.rename(tmp, part)) fs.delete(old, true)
            } else {
              fs.delete(tmp, true)
              fs.rename(old, part)
            }
          }
        // a crash BEFORE purgeTsLayout's first rename leaves a
        // `_tmp-clean-<d>` with no `_old-clean-<d>` twin — the live
        // partition is intact, the staging is pure garbage: sweep it
        fs.listStatus(metricDir).map(_.getPath)
          .filter(_.getName.startsWith("_tmp-clean-")).foreach { tmp =>
            val d = tmp.getName.stripPrefix("_tmp-clean-")
            if (!fs.exists(new Path(metricDir, s"_old-clean-$d")))
              fs.delete(tmp, true)
          }
      }
  }

  /** The `k=v` partition-directory chain under one batch partition (walk
    * one branch — Hive layouts are uniform within a table). */
  private def innerPartitionCols(fs: FileSystem, part: Path): Seq[String] = {
    val cols = Seq.newBuilder[String]
    var cur = part
    var descending = true
    while (descending) {
      val subs = fs.listStatus(cur)
        .filter(st => st.isDirectory && st.getPath.getName.contains("=") &&
          !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .map(_.getPath)
      if (subs.isEmpty) descending = false
      else {
        cols += subs.head.getName.split("=", 2)(0)
        cur = subs.head
      }
    }
    cols.result()
  }

  /** Complete any crashed purge swap: for each `_old-clean-<N>` leftover,
    * roll forward (staged `_tmp-clean-<N>` has a _SUCCESS -> becomes the
    * partition) or roll back (no complete staged copy -> the old
    * partition returns). Idempotent; cheap (pure driver-side renames). */
  def repair(spark: SparkSession, sinkDir: String): Unit = {
    val fs = fsFor(spark, sinkDir)
    val root = new Path(sinkDir)
    if (!fs.exists(root)) return
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("_old-clean-")).foreach { old =>
        val b = old.getName.stripPrefix("_old-clean-")
        val part = new Path(sinkDir, s"batch_id=$b")
        val tmp = new Path(sinkDir, s"_tmp-clean-$b")
        if (fs.exists(part)) fs.delete(old, true) // swap finished; old is trash
        else if (fs.exists(new Path(tmp, "_SUCCESS"))) {
          if (fs.rename(tmp, part)) fs.delete(old, true)
        } else {
          fs.delete(tmp, true)
          fs.rename(old, part)
        }
      }
  }
}
