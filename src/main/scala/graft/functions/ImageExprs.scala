package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Catalyst expressions over the [[ImageOps]] kernels — the multimodal
  * decode seam as native codegen'd functions (SURVEY.md §2.10 pattern,
  * same registration surface as `vector_dot`). The generated Java calls
  * the static-forwarded kernel directly, so the decode stays inside the
  * whole-stage-codegen span: one virtual call per row, no interpreted
  * fallback, no lambda allocation. */

/** `image_dhash(bytes) -> BIGINT`: 64-bit perceptual difference hash.
  * Real images hash their decoded luminance plane; non-image payloads
  * take the deterministic byte-sampling fallback (bit-identical to the
  * pre-decode stub, so existing oracles/hashes over synthetic payloads
  * are unchanged). */
case class ImageDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "image_dhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got ${dt.catalogString}")
  }

  override def nullSafeEval(b: Any): Any =
    ImageOps.dhash(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ImageOps.dhash($b)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `image_resize(bytes, w, h) -> BINARY`: real images re-encode as a
  * nearest-neighbor-resampled w x h PNG; non-image payloads keep the
  * cyclic byte tiling of the stub (exactly w*h bytes). */
case class ImageResize(bytes: Expression, w: Expression, h: Expression)
  extends TernaryExpression {

  override def first: Expression = bytes
  override def second: Expression = w
  override def third: Expression = h
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_resize"

  override def checkInputDataTypes(): TypeCheckResult =
    (bytes.dataType, w.dataType, h.dataType) match {
      case (BinaryType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (BINARY, INT, INT), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def nullSafeEval(b: Any, ww: Any, hh: Any): Any =
    ImageOps.resizeOrTile(b.asInstanceOf[Array[Byte]],
      ww.asInstanceOf[Int], hh.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, ww, hh) => s"graft.functions.ImageOps.resizeOrTile($b, $ww, $hh)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(bytes = newFirst, w = newSecond, h = newThird)
}
