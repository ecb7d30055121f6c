package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Left-to-right double dot product of two `array<float>` columns, as a
  * codegen'd Catalyst expression: `dot_d(a, b)`.
  *
  * Numerically IDENTICAL to the declarative formulation it replaces —
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d,
  * (acc, v) -> acc + v)` — each float widened to double (exact), products
  * accumulated left to right from a 0.0 seed, so every oracle that
  * hash-compares against DuckDB's `list_reduce(list_transform(...))`
  * stays bit-for-bit. Null semantics also match the HOF chain: NULL when
  * either array is NULL, when lengths differ (zip_with pads with NULL),
  * or when any element is NULL.
  *
  * Why it exists: higher-order functions are `CodegenFallback` in Spark —
  * the lambda body runs on the interpreted expression path, per element,
  * per row. This loop fuses into whole-stage codegen: no lambda-variable
  * boxing, no per-element function dispatch, and the similarity kernel of
  * every ANN scan (the innermost loop of a 100 TB brute-force or IVF
  * pass) stays in the generated code. Measured: v_knn_brute (scan +
  * score + rank) 0.85 s -> 0.40 s best-of-3 at sf0.1.
  *
  * Input arrays must be `array<float>`, enforced at analysis time via
  * `checkInputDataTypes` (Spark 4 keeps `AbstractDataType` private, so no
  * `ExpectsInputTypes` mixin — but the public check hook suffices; getFloat
  * on a non-float array would otherwise read garbage strides silently).
  */
final case class DotProductDExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_d"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
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
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
            $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
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
