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

  test("admit equals a brute-force trie walk on random corpora (seeded)") {
    val rnd = new scala.util.Random(7)
    val cfg3 = QuotaConfig(Seq("metric", "user"), Seq(3L, 2L),
      overrides = Seq(Seq("m1") -> 4L))
    def randKeys(n: Int): Seq[(String, String)] =
      Seq.fill(n)((s"m${rnd.nextInt(5)}", s"u${rnd.nextInt(8)}")).distinct
    def brute(existing: Seq[(String, String)], incoming: Seq[(String, String)])
        : Map[(String, String), Option[Int]] = {
      val exSet = existing.toSet
      val newKeys = incoming.distinct.filterNot(exSet)
      // depth 1: new metrics ranked among themselves vs root headroom
      val exMetrics = existing.map(_._1).distinct.toSet
      val newMetrics = newKeys.map(_._1).distinct.filterNot(exMetrics).sorted
      val mHeadroom = math.max(cfg3.defaultChildrenQuota(0) - exMetrics.size, 0L)
      val rejM = newMetrics.drop(mHeadroom.toInt).toSet
      // depth 2: per surviving metric, new users ranked vs that metric's quota
      val d2 = newKeys.filterNot(k => rejM(k._1)).groupBy(_._1).flatMap {
        case (m, ks) =>
          val q = cfg3.overrides.collectFirst { case (Seq(`m`), v) => v }
            .getOrElse(cfg3.defaultChildrenQuota(1))
          val exU = existing.filter(_._1 == m).map(_._2).distinct.size
          val head = math.max(q - exU, 0L).toInt
          ks.map(_._2).distinct.sorted.zipWithIndex.map { case (u, i) =>
            (m, u) -> (if (i < head) None else Some(2))
          }
      }
      incoming.distinct.map { k =>
        k -> (if (exSet(k)) None
              else if (rejM(k._1)) Some(1)
              else d2(k))
      }.toMap
    }
    (1 to 5).foreach { _ =>
      val ex = randKeys(rnd.nextInt(10))
      val in = randKeys(6 + rnd.nextInt(12))
      val got = Quota.admit(samples(ex: _*), samples(in: _*), cfg3)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          Option(r.get(3)).map(_.toString.toInt)).toMap
      got shouldEqual brute(ex, in)
    }
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
