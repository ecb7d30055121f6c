package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Left-to-right dot product of two `array<double>` columns, as a
  * codegen'd Catalyst expression: `dot_dd(a, b)` — the double-array
  * sibling of [[DotProductDExpression]] (which reads `array<float>`).
  *
  * Numerically IDENTICAL to the declarative fold it replaces —
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)`
  * — products accumulated left to right from a 0.0 seed, so the SQ8
  * family's decoded-cosine micros (which hash-compare against DuckDB's
  * seeded `list_reduce`) stay bit-for-bit. Null semantics match the HOF
  * chain: NULL when either array is NULL, when lengths differ (zip_with
  * pads with NULL), or when any element is NULL.
  *
  * Why it exists: the SQ8 tiers score on DECODED reconstructions
  * (`array<double>` — see VectorOps.sq8Recon / Sq8DecodeExpression), so
  * their inner products could not use `dot_d` and fell back to the
  * higher-order-function chain, which is `CodegenFallback` in Spark —
  * the lambda body runs interpreted, per element, per row, exactly the
  * cost dot_d was built to remove from the float path (measured there:
  * v_knn_brute 0.85 -> 0.40 s at sf0.1). This keeps the stored-SQ8
  * panel scan and the cascade's tier-2 rerank inside whole-stage
  * codegen end to end: decode (`sq8_decode`) and score (`dot_dd`) both
  * generate loops.
  */
final case class DotProductDDExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_dd"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      code"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          int $i = 0;
          for (; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $acc += $a.getDouble($i) * $b.getDouble($i);
          }
          if ($i == $n) { ${ev.value} = $acc; }
        }
      """.toString
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression,
  ): Expression = copy(left = newLeft, right = newRight)
}
