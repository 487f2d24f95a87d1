package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `audio_ahash(bytes) -> BIGINT`: 64-bit perceptual audio hash (energy-
  * envelope difference hash over real decoded PCM — see [[AudioOps]]).
  * Non-audio payloads take the byte-sampling fallback shared with
  * [[ImageDHash]], bit-identical, so kind-dispatched hashing leaves every
  * synthetic-fixture oracle unchanged. Same registration surface and
  * codegen shape as the image expressions: one static kernel call per row
  * inside the whole-stage span. */
case class AudioAHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "audio_ahash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got ${dt.catalogString}")
  }

  override def nullSafeEval(b: Any): Any =
    AudioOps.ahash(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.AudioOps.ahash($b)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
