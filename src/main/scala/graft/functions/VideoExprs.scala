package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `video_thash(bytes) -> BIGINT`: 64-bit perceptual video hash (mean-
  * luminance temporal difference hash over real composited animated-GIF
  * frames — see [[VideoOps]]). Non-video payloads take the byte-sampling
  * fallback shared with [[ImageDHash]] / [[AudioAHash]], bit-identical,
  * so kind-dispatched hashing leaves every synthetic-fixture oracle
  * unchanged. Same registration surface and codegen shape as the image
  * and audio expressions: one static kernel call per row inside the
  * whole-stage span. */
case class VideoTHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "video_thash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got ${dt.catalogString}")
  }

  override def nullSafeEval(b: Any): Any =
    VideoOps.thash(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.VideoOps.thash($b)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
