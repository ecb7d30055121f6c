package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar companion to [[BloomUvAggregate]]: the reference's ×`seed`
  * polynomial string hash masked to `capBits`
  * (UvWithBloomFilter.java:103-108) as a codegen'd Catalyst expression —
  * `bloom_hash(s)` returns the bitmap offset an id maps to.
  *
  * This is the (b)-tier extension path from the build contract: a native
  * `UnaryExpression` with `doGenCode`, so it fuses into whole-stage codegen
  * (no lambda/UDF boxing, no codegen fence). Useful for explaining/
  * debugging collisions in the bitmap UV and for bucketing by the same
  * function the aggregate uses.
  */
final case class BloomHashExpression(
    child: Expression,
    capBits: Int = 29,
    seed: Int = 61,
) extends UnaryExpression {

  // input is STRING by construction: the registration builder wraps the
  // argument in Cast(_, StringType) — mirroring the reference's
  // userId.toString() — instead of declaring inputTypes (AbstractDataType
  // is private[sql] in Spark 4)
  private val mask: Long = (1L << capBits) - 1

  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var r = 0L
    var i = 0
    while (i < s.length) { r = r * seed + s.charAt(i); i += 1 }
    r & mask
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      code"""
        java.lang.String $s = $c.toString();
        long $r = 0L;
        for (int $i = 0; $i < $s.length(); $i++) {
          $r = $r * $seed + $s.charAt($i);
        }
        ${ev.value} = $r & ${mask}L;
      """.toString
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
