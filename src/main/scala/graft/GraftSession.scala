package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so every entry point (tests, Verify, Bench,
  * driver) gets identical, scale-conscious settings.
  *
  * Notes:
  *  - `spark.sql.shuffle.partitions` is sized to local cores (the driver
  *    contract) — on a real cluster this would be set to ~2-3x total cores
  *    or left to AQE coalescing, which is enabled here and does the right
  *    thing at 100 TB (it merges tiny post-shuffle partitions and splits
  *    skewed ones at runtime).
  *  - `spark.sql.legacy.parquet.nanosAsLong` — the driver's `events` table
  *    stores TIMESTAMP(NANOS) which Spark 4 otherwise rejects; reading it
  *    as epoch-nanos Long is exact and we normalize to epoch millis
  *    (the reference's native unit, see SURVEY.md §1.2 `ts`).
  */
object GraftSession {
  /** Engine version — single source for the API's buildinfo and build.sbt. */
  val Version = "0.5.0"

  def builder(master: String = "local[*]", shufflePartitions: String = "32"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // native codegen'd functions (vector_dot) via the public extension API
      .withExtensions(graft.functions.VectorExprs.install)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // spark.sql.join.preferSortMergeJoin=false was TRIED this round
      // (guide §3.1) and measured neutral-to-negative on the suite
      // (q64 2.43->3.38 s, q99 1.38->2.24 s in back-to-back sessions):
      // the joins that matter here either broadcast already or carry
      // sorted children into downstream ops — left at the default.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // RDD-level loops (components fixed point, BPE merge rounds)
      // shuffle primitive pairs; Kryo serializes them several times
      // faster than Java serialization (SQL/tungsten paths unaffected)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      // PromQL arithmetic is IEEE-754: x/0 = +-Inf, 0/0 = NaN. Spark 4's
      // default ANSI mode raises DIVIDE_BY_ZERO instead — turn it off.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cpus]", math.max(cpus, 4).toString).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply graft settings onto an externally-created session (driver owns it). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark
  }
}
