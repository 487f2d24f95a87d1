package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.BinaryOps

/** The reference's binary-operator battery, ported literally
  * (ref:query/src/test/scala/filodb/query/exec/rangefn/
  * BinaryOperatorSpec.scala:48-247): every operator must match the Java
  * double semantics its reference impl is written in
  * (ref:query/exec/binaryOp/BinaryOperatorFunction.scala:20-73) —
  * INCLUDING the cases where Spark's SQL operators diverge:
  *  - Spark orders NaN as the largest double and NaN == NaN is true, so
  *    raw column comparisons keep exactly the wrong samples (Java: every
  *    comparison with NaN is false except !=);
  *  - filter comparisons emit the LHS operand (prefix `5 > v` emits 5);
  *  - bool comparisons answer NaN, not 0/1, when either operand is NaN;
  *  - `/` NULLs zero divisors (and would lose the divisor's -0.0 sign);
  *  - `%` NULLs zero divisors (Java fmod(x, 0) = NaN).
  * This battery caught the comparison divergences; fixes in [[BinaryOps]].
  */
class BinaryOpsSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", "4").getOrCreate()

  // the reference's special-cases vector (+Inf, regular, zero, negative,
  // NaN — BinaryOperatorSpec.scala:107-121) extended with -Inf and -0.0
  private val specials =
    Seq(2.0 / 0d, -2.0 / 0d, 4.5, 0d, -0.0d, -2.1, 5.9, Double.NaN, 3.3)
  private val scalars = Seq(5.0, Double.NaN, 0.0)
  private val arithOps = Seq("+", "-", "*", "%", "/", "^")
  private val cmpOps = Seq("==", "!=", ">", ">=", "<", "<=")

  private def javaArith(op: String, l: Double, r: Double): Double = op match {
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    case "%" => l % r
    case "/" => l / r
    case "^" => math.pow(l, r)
  }

  private def javaCmp(op: String, l: Double, r: Double): Boolean = op match {
    case "==" => l == r
    case "!=" => l != r
    case ">"  => l > r
    case ">=" => l >= r
    case "<"  => l < r
    case "<=" => l <= r
  }

  /** evaluate a BinaryOps column over (l, r) pairs, preserving order */
  private def eval(pairs: Seq[(Double, Double)],
                   mk: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
                     org.apache.spark.sql.Column): Seq[Double] = {
    import spark.implicits._
    pairs.zipWithIndex.map { case ((l, r), i) => (i, l, r) }.toDF("i", "l", "r")
      .select(col("i"), mk(col("l"), col("r")).as("v"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq
  }

  private def sameDouble(a: Double, e: Double): Boolean =
    (a.isNaN && e.isNaN) || a == e ||
      (!a.isInfinity && !e.isInfinity &&
        math.abs(a - e) <= 1e-12 * math.max(math.abs(a), math.abs(e)))

  test("reference battery: arithmetic ops match Java on every (special, " +
       "scalar) pair, both operand orders — incl. x/0 signs and fmod(x,0)") {
    val pairs = for (v <- specials; s <- scalars; p <- Seq((s, v), (v, s))) yield p
    arithOps.foreach { op =>
      val actual = eval(pairs, (l, r) => BinaryOps.scalarOp(op, l, r))
      pairs.zip(actual).foreach { case ((l, r), a) =>
        val e = javaArith(op, l, r)
        withClue(s"$l $op $r: expected $e got $a: ") {
          sameDouble(a, e) shouldEqual true
        }
      }
    }
  }

  test("division by negative zero answers the Java -Inf, not Spark's " +
       "sign-normalized +Inf") {
    val pairs = Seq((1.0, -0.0), (-1.0, -0.0), (1.0, 0.0), (-1.0, 0.0),
      (0.0, -0.0), (Double.NaN, -0.0))
    val actual = eval(pairs, (l, r) => BinaryOps.scalarOp("/", l, r))
    pairs.zip(actual).foreach { case ((l, r), a) =>
      withClue(s"$l / $r: ") { sameDouble(a, l / r) shouldEqual true }
    }
  }

  test("reference battery: filter comparisons keep iff the JAVA comparison " +
       "holds with a non-NaN lhs (ref returns lhs else NaN = no sample)") {
    val pairs = for (v <- specials; s <- scalars; p <- Seq((s, v), (v, s))) yield p
    cmpOps.foreach { op =>
      val kept = eval(pairs, (l, r) => BinaryOps.cmpKeep(op, l, r).cast("double"))
      pairs.zip(kept).foreach { case ((l, r), a) =>
        val e = if (javaCmp(op, l, r) && !l.isNaN) 1.0 else 0.0
        withClue(s"$l $op $r: ") { a shouldEqual e }
      }
    }
  }

  test("reference battery: bool comparisons answer NaN when either operand " +
       "is NaN, else the Java 1/0 (ref *_BOOL variants)") {
    val pairs = for (v <- specials; s <- scalars; p <- Seq((s, v), (v, s))) yield p
    cmpOps.foreach { op =>
      val actual = eval(pairs, (l, r) => BinaryOps.cmpBool(op, l, r))
      pairs.zip(actual).foreach { case ((l, r), a) =>
        val e = if (l.isNaN || r.isNaN) Double.NaN
                else if (javaCmp(op, l, r)) 1.0 else 0.0
        withClue(s"$l $op bool $r: ") { sameDouble(a, e) shouldEqual true }
      }
    }
  }

  test("randomized battery: prefix and suffix arithmetic over 100 series " +
       "match scala expected (ref BinaryOperatorSpec:48-66)") {
    val rand = new scala.util.Random(42)
    val vals = Seq.fill(200)(rand.nextDouble() * 100 - 50)
    val s = 5.0
    arithOps.foreach { op =>
      val prefix = eval(vals.map((s, _)), (l, r) => BinaryOps.scalarOp(op, l, r))
      val suffix = eval(vals.map((_, s)), (l, r) => BinaryOps.scalarOp(op, l, r))
      vals.zip(prefix).foreach { case (v, a) =>
        withClue(s"$s $op $v: ") { sameDouble(a, javaArith(op, s, v)) shouldEqual true }
      }
      vals.zip(suffix).foreach { case (v, a) =>
        withClue(s"$v $op $s: ") { sameDouble(a, javaArith(op, v, s)) shouldEqual true }
      }
    }
  }

  // ---- end-to-end through the PromQL planner ----

  import graft.promql.PromPlanner

  private def ctxOf(values: Seq[Double]): PromPlanner.Ctx = {
    import spark.implicits._
    val samples = values.zipWithIndex.map { case (v, i) =>
      ("m", Map("s" -> i.toString), 20000L, v)
    }.toDF("metric", "tags", "ts", "value")
    PromPlanner.Ctx(spark, samples, 20000L, 20000L, 1000L)
  }

  private def byLabel(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getAs[Map[String, String]]("labels")("s") ->
      r.getAs[Double]("value")).toMap

  test("prefix filter comparison through PromQL emits the SCALAR as the " +
       "kept value, like the reference ScalarOperationMapper") {
    val out = byLabel(PromPlanner.queryRange(ctxOf(Seq(1.0, 9.0, 5.0)), "5 >= m"))
    out shouldEqual Map("0" -> 5.0, "2" -> 5.0) // 5>=1 and 5>=5 keep scalar 5
  }

  test("NaN scalar comparisons through PromQL: filter keeps nothing, bool " +
       "answers NaN per sample") {
    PromPlanner.queryRange(ctxOf(Seq(1.0, 9.0)), "NaN > m").count() shouldEqual 0
    PromPlanner.queryRange(ctxOf(Seq(1.0, 9.0)), "m <= NaN").count() shouldEqual 0
    val bools = byLabel(PromPlanner.queryRange(ctxOf(Seq(1.0, 9.0)), "m > bool NaN"))
    bools.size shouldEqual 2
    bools.values.forall(_.isNaN) shouldEqual true
  }

  test("computed -0.0 divisor through PromQL: 1 / (m * -1) at m=0 answers " +
       "-Inf (Java), and m != bool NaN-producing expr propagates NaN") {
    val div = byLabel(PromPlanner.queryRange(ctxOf(Seq(0.0)), "1 / (m * -1)"))
    div("0").isNegInfinity shouldEqual true
    // sqrt of a negative sample is NaN; bool comparison against it -> NaN
    val b = byLabel(PromPlanner.queryRange(ctxOf(Seq(-2.1)), "m == bool (m ^ 0.5)"))
    b("0").isNaN shouldEqual true
  }

  test("vector-vector filter comparison drops NaN-valued matches (Java " +
       "ordering), where Spark's NaN-is-largest would keep them") {
    // lhs has a NaN-producing member: m ^ 0.5 is NaN for the negative
    // sample; (m ^ 0.5) > m must NOT emit that series even though Spark
    // orders NaN > -2.1 as true
    val out = byLabel(PromPlanner.queryRange(ctxOf(Seq(-2.1, 0.25)), "(m ^ 0.5) > m"))
    out shouldEqual Map("1" -> 0.5) // sqrt(.25)=.5 > .25; NaN row dropped
  }
}
