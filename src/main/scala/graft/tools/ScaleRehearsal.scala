package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Scale-rehearsal corpus generator: amplify a driver testdata directory
  * `factor`x so the headline dedup/ANN/curation entries can be timed at
  * sf1-equivalent (and beyond) without the driver regenerating testdata —
  * the direct evidence for "survives 100x" that local[32] timings at
  * sf0.1 can't give.
  *
  * Amplification is deterministic and SHAPE-PRESERVING, not row
  * duplication: each copy k gets disjoint id ranges, and content is
  * re-keyed so cross-copy similarity structure does NOT explode —
  *   - documents: every word of copy k > 0 gets a separator + `k` suffix
  *     (the separator is a control char no token contains), so copy
  *     shingle/fingerprint vocabularies are PROVABLY disjoint:
  *     within-copy dup/near-dup structure mirrors the base corpus
  *     (output grows ~linearly), no artificial cross-copy pairs whose
  *     quadratic pair lists would distort the timings;
  *   - embeddings: copy k rotates the vector by k positions — norms and
  *     cluster mixture preserved, directions decorrelated across copies;
  *   - events: new user/event id ranges per copy (session/funnel
  *     workloads scale by user count, the real growth axis);
  *   - customer/orders/lineitem: key-offset copies (joins stay valid);
  *     region/nation/part/supplier stay fixed (dimension tables don't
  *     grow with data volume in TPC-H either).
  *
  * Usage: runMain graft.tools.ScaleRehearsal <srcDir> <dstDir> <factor>
  */
object ScaleRehearsal {

  private val Stride = 1000000000L

  private def amplify(df: DataFrame, factor: Int)(copy: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(k => if (k == 0) df else copy(df, k)).reduce(_ unionByName _)

  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int = 32): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    write(amplify(read("documents"), factor) { (d, k) =>
      // a \\u0001 separator cannot appear in whitespace-split tokens, so
      // copy vocabularies are disjoint even when base words end in digits
      // (plain "word"+k would collide: copy 1 of "item1" == copy 11 of
      // "item" at factors > 10)
      d.select(
        (col("doc_id") + lit(k * Stride)).as("doc_id"),
        concat_ws(" ",
          transform(split(col("text"), " "), w => concat(w, lit("\u0001" + k)))).as("text"),
        col("lang"), col("source"), col("n_chars"))
        .withColumn("n_chars", length(col("text")))
    }, "documents")

    val dim = read("embeddings").select(size(col("embedding"))).head().getInt(0)
    write(amplify(read("embeddings"), factor) { (d, k) =>
      val r = k % dim
      val rotated =
        if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, dim - r), slice(col("embedding"), 1, r))
      d.select((col("vec_id") + lit(k * Stride)).as("vec_id"),
        rotated.as("embedding"), col("label"))
    }, "embeddings")

    write(amplify(read("events"), factor) { (d, k) =>
      d.select((col("event_id") + lit(k * Stride)).as("event_id"), col("ts"),
        (col("user_id") + lit(k * Stride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }, "events")

    write(amplify(read("customer"), factor) { (d, k) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(k * Stride))
    }, "customer")
    write(amplify(read("orders"), factor) { (d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(k * Stride))
        .withColumn("o_custkey", col("o_custkey") + lit(k * Stride))
    }, "orders")
    write(amplify(read("lineitem"), factor) { (d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(k * Stride))
    }, "lineitem")

    for (t <- Seq("region", "nation", "part", "supplier"))
      write(read(t), t, parts = 1)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleRehearsal <srcDir> <dstDir> <factor>")
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    run(spark, args(0), args(1), args(2).toInt)
    spark.stop()
  }
}
