package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression:
  * `nfc(s)` — canonical composition (é as one codepoint, not e + U+0301),
  * the first step of every corpus normalization pipeline (CCNet, C4,
  * Dolma) and a prerequisite for byte-level dedup keys: the SAME visible
  * text must hash identically whether a crawler emitted it composed or
  * decomposed.
  *
  * Spark has no built-in for this (`lower`/`translate` don't touch
  * combining marks), so this is the (b)-tier extension path: a native
  * `UnaryExpression` whose generated code calls
  * `java.text.Normalizer.normalize` directly inside whole-stage codegen —
  * no UDF boxing, no codegen fence around the surrounding projection.
  * The JDK implements Unicode canonical composition, the same algorithm
  * DuckDB's `nfc_normalize` implements, so oracle queries can mirror it
  * exactly. Fast path: `Normalizer.isNormalized` is O(n) with no
  * allocation and nearly always true on real corpora (ASCII is always
  * NFC), so the allocating normalize call runs only on rows that need it.
  */
final case class NfcNormalizeExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      code"""
        java.lang.String $s = $c.toString();
        if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
          ${ev.value} = $c;
        } else {
          ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
            java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
        }
      """.toString
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
