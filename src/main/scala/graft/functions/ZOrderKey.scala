package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `zorder16(a, b)` — the 32-bit Morton (Z-order) key of two 16-bit
  * quantized dimensions: bits of `a` land in the even positions, bits
  * of `b` in the odd ones. Inputs are masked to their low 16 bits, so
  * callers quantize first and the expression is total.
  *
  * Why native: Z-ordering is a LAYOUT operator — at 100 TB it runs
  * once per row of an entire table rewrite, so it must live inside
  * whole-stage codegen. The bit-spread uses the standard
  * magic-number doubling ladder (public-domain "Interleave bits by
  * Binary Magic Numbers", Stanford Bit Twiddling Hacks): 4 shift-mask
  * steps per dimension, no loop, no branch. A SQL formulation (the
  * oracle replicates exactly this ladder arithmetically) would be a
  * ~40-node expression tree evaluated per row; this is 10 long ops.
  *
  * Sorting or bucketing by the returned key co-locates rows that are
  * close in BOTH dimensions, which is what makes min/max file skipping
  * effective on two-predicate scans — the layout half of the engine's
  * pruning story (see Packing.qZorderLayout for the measured claim).
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"zorder16 requires (bigint, bigint), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "zorder16"

  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xffffL
    v = (v | (v << 8)) & 0x00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0fL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |long $x = $a & 0xffffL;
         |$x = ($x | ($x << 8)) & 0x00ff00ffL;
         |$x = ($x | ($x << 4)) & 0x0f0f0f0fL;
         |$x = ($x | ($x << 2)) & 0x33333333L;
         |$x = ($x | ($x << 1)) & 0x55555555L;
         |long $y = $b & 0xffffL;
         |$y = ($y | ($y << 8)) & 0x00ff00ffL;
         |$y = ($y | ($y << 4)) & 0x0f0f0f0fL;
         |$y = ($y | ($y << 2)) & 0x33333333L;
         |$y = ($y | ($y << 1)) & 0x55555555L;
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}
