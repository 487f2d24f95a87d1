package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Quota
import graft.operators.Quota.QuotaConfig

class QuotaSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", "4").getOrCreate()
  import spark.implicits._

  private def samples(rows: (String, String)*) =
    rows.zipWithIndex.map { case ((m, u), i) => (i.toLong, m, u, 0L, 1.0) }
      .toDF("series_id", "metric", "user", "ts", "value")

  private val cfg = QuotaConfig(Seq("metric", "user"), Seq(10L, 2L))

  private def verdictMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getBoolean(2), Option(r.get(3)).map(_.toString.toInt)))).toMap

  test("leaf quota admits up to headroom in deterministic child order") {
    val in = samples("m" -> "a", "m" -> "b", "m" -> "c", "m" -> "d", "n" -> "x")
    val v = verdictMap(Quota.admit(samples(), in, cfg))
    v(("m", "a")) shouldEqual ((true, None))
    v(("m", "b")) shouldEqual ((true, None))
    v(("m", "c")) shouldEqual ((false, Some(2)))
    v(("m", "d")) shouldEqual ((false, Some(2)))
    v(("n", "x")) shouldEqual ((true, None))
  }

  test("existing children consume headroom; known series always admitted") {
    val ex = samples("m" -> "a")
    val in = samples("m" -> "a", "m" -> "b", "m" -> "c")
    val v = verdictMap(Quota.admit(ex, in, cfg))
    v(("m", "a")) shouldEqual ((true, None)) // already known
    v(("m", "b")) shouldEqual ((true, None)) // headroom 2-1=1
    v(("m", "c")) shouldEqual ((false, Some(2)))
  }

  test("root quota rejects whole new subtrees; no double-reporting deeper") {
    val c = QuotaConfig(Seq("metric", "user"), Seq(2L, 10L))
    val ex = samples("m1" -> "a", "m2" -> "a")
    val in = samples("m3" -> "a", "m3" -> "b", "m3" -> "c")
    val v = Quota.admit(ex, in, c).collect()
    v.length shouldEqual 3
    all(v.map(_.getBoolean(2))) shouldBe false
    all(v.map(_.getInt(3))) shouldEqual 1 // rejected at the ROOT depth only
  }

  test("per-prefix override replaces the depth default for that node only") {
    val c = cfg.copy(overrides = Seq(Seq("m") -> 3L))
    val in = samples("m" -> "a", "m" -> "b", "m" -> "c", "m" -> "d",
      "n" -> "a", "n" -> "b", "n" -> "c")
    val v = verdictMap(Quota.admit(samples(), in, c))
    v(("m", "c")) shouldEqual ((true, None))     // override lifts m to 3
    v(("m", "d")) shouldEqual ((false, Some(2)))
    v(("n", "c")) shouldEqual ((false, Some(2))) // n keeps the default 2
  }

  test("admission is deterministic under repartitioning") {
    val in = samples("m" -> "d", "m" -> "a", "m" -> "c", "m" -> "b")
    val a = verdictMap(Quota.admit(samples(), in, cfg))
    val b = verdictMap(Quota.admit(samples(), in.repartition(7), cfg))
    a shouldEqual b
    a(("m", "a"))._1 shouldBe true // rank by child key, not arrival order
    a(("m", "d"))._1 shouldBe false
  }

  test("quotaState reports children counts, quotas and headroom per prefix") {
    val ex = samples("m" -> "a", "m" -> "b", "n" -> "a")
    val st = Quota.quotaState(ex, cfg.copy(overrides = Seq(Seq("m") -> 5L)))
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    st((1, "")) shouldEqual ((2L, 10L, 8L))  // root: 2 metrics of 10
    st((2, "m")) shouldEqual ((2L, 5L, 3L))  // override applies
    st((2, "n")) shouldEqual ((1L, 2L, 1L))
  }
}
