package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner, with the
  * alphabet table — `distance("CA", "ABC") == 2`, where the restricted
  * OSA variant says 3). A top-level object gets static forwarders, so
  * whole-stage codegen can call `graft.functions.DamerauLevenshtein
  * .distance(...)` directly from generated Java.
  *
  * Semantics match DuckDB's `damerau_levenshtein` (probed: CA/ABC = 2,
  * ab/ba = 1, kitten/sitting = 3), so the catalog query that uses the
  * expression hash-gates this implementation against DuckDB's, pair by
  * pair. Operates on Java chars (sufficient for the BMP; the corpus's
  * entity names are ASCII — documented bound, same as the built-in
  * levenshtein's).
  */
object DamerauLevenshtein {
  def distance(sa: String, sb: String): Int = {
    val (a, b) = (sa, sb)
    val (la, lb) = (a.length, b.length)
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = { val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue }
        val l = db
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}

/** `dl_distance(a, b)` as a codegen'd Catalyst expression — Spark ships
  * `levenshtein` but not the transposition-aware Damerau variant, which
  * is the edit model for human typos ("wdiget" is one transposition,
  * two substitutions). (b)-tier extension path like [[NfcNormalizeExpression]]:
  * the generated code calls the static kernel inside whole-stage
  * codegen, no UDF boxing.
  */
final case class DamerauLevenshteinExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "dl_distance"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshtein.distance(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      code"""
        ${ev.value} = graft.functions.DamerauLevenshtein.distance(
          $l.toString(), $r.toString());
      """.toString
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
