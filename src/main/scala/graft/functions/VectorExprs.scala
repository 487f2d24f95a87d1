package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst kernel for embedding math (SURVEY.md §2.10 "custom
  * kernels": prefer a codegen'd Expression over interpreted higher-order
  * functions on the hot path). `zip_with` + `aggregate` evaluate an
  * interpreted lambda per element with a closure allocation per call —
  * fine for occasional use, but similarity search evaluates dot products
  * per candidate PAIR. This expression compiles to a tight primitive loop
  * inside whole-stage codegen, registered through the PUBLIC
  * SparkSessionExtensions surface (GraftSession installs it).
  *
  * Contract: both arrays are same-length, null-free numeric vectors (the
  * embedding-column invariant); summation is index-ascending, so results
  * are bit-identical to the `aggregate(zip_with(...))` formulation it
  * replaces.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed locals: with non-nullable children
      // nullSafeCodeGen emits this snippet without its own scoping block,
      // so several DotProduct instances in one operator (cosine alone
      // builds three) would otherwise redeclare the same Java locals and
      // break codegen compilation (silent interpreted fallback).
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Positionwise agreement count of two ARRAY<BIGINT> columns — the MinHash
  * signature estimator's inner loop (est_jaccard = agreeing positions /
  * numHashes). The standing near-dup index evaluates this once per
  * (probe doc, candidate) PAIR on the per-batch hot path, where the
  * `aggregate(zip_with(...))` formulation pays an interpreted lambda and a
  * closure allocation per element; this compiles to a tight primitive loop
  * inside whole-stage codegen (the [[DotProduct]] pattern). Bit-identical
  * to the lambda it replaces: same min-length bound, same index-ascending
  * comparison over null-free signature arrays. */
case class ArrayAgreeCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "vector_agree"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName per instance — see DotProduct's scoping note
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  /** Install graft's native functions — passed to
    * `SparkSession.builder.withExtensions` (the public extension point). */
  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"vector_dot expects 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vector_agree"),
      new ExpressionInfo(classOf[ArrayAgreeCount].getName, "vector_agree"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"vector_agree expects 2 arguments, got ${children.size}")
        ArrayAgreeCount(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("image_dhash"),
      new ExpressionInfo(classOf[ImageDHash].getName, "image_dhash"),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"image_dhash expects 1 argument, got ${children.size}")
        ImageDHash(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("image_resize"),
      new ExpressionInfo(classOf[ImageResize].getName, "image_resize"),
      (children: Seq[Expression]) => {
        require(children.size == 3, s"image_resize expects 3 arguments, got ${children.size}")
        ImageResize(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("audio_ahash"),
      new ExpressionInfo(classOf[AudioAHash].getName, "audio_ahash"),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"audio_ahash expects 1 argument, got ${children.size}")
        AudioAHash(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("video_thash"),
      new ExpressionInfo(classOf[VideoTHash].getName, "video_thash"),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"video_thash expects 1 argument, got ${children.size}")
        VideoTHash(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_encode_doc"),
      new ExpressionInfo(classOf[BpeEncodeDoc].getName, "bpe_encode_doc"),
      (children: Seq[Expression]) => {
        require(children.size == 3, s"bpe_encode_doc expects 3 arguments, got ${children.size}")
        BpeEncodeDoc(children.head, children(1), children(2))
      }))
  }

  /** Codegen'd dot product of two ARRAY<DOUBLE> columns (requires a
    * GraftSession-built session, which registers `vector_dot`). */
  def dot(a: Column, b: Column): Column = call_function("vector_dot", a, b)

  /** Codegen'd positionwise agreement count of two ARRAY<BIGINT> columns
    * (requires a GraftSession-built session). */
  def agreeCount(a: Column, b: Column): Column = call_function("vector_agree", a, b)
}
