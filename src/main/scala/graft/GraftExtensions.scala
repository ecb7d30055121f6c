package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.StringType

import graft.functions.{BloomHashExpression, BloomUvAggregate, DamerauLevenshteinExpression, DotProductDExpression, NfcNormalizeExpression}

/** SparkSessionExtensions hook — the standard deployment path for the
  * engine's custom Catalyst functions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * makes `bloom_uv` / `bloom_hash` / `nfc` / `dot_d` available in every session without any
  * driver-side `GraftFunctions.register` call (which remains for
  * programmatic use). This is the (c)-tier extension surface from the
  * build contract; no custom Rule/Strategy is injected because no
  * reference capability needs one (SURVEY §4: Catalyst subsumes every
  * manual optimization the reference hand-codes).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("bloom_uv"),
      new ExpressionInfo(classOf[BloomUvAggregate].getName, "bloom_uv"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"bloom_uv expects exactly 1 argument, got ${exprs.length}")
        BloomUvAggregate(exprs.head)
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("bloom_hash"),
      new ExpressionInfo(classOf[BloomHashExpression].getName, "bloom_hash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"bloom_hash expects exactly 1 argument, got ${exprs.length}")
        BloomHashExpression(Cast(exprs.head, StringType))
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("nfc"),
      new ExpressionInfo(classOf[NfcNormalizeExpression].getName, "nfc"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"nfc expects exactly 1 argument, got ${exprs.length}")
        NfcNormalizeExpression(exprs.head)
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("dl_distance"),
      new ExpressionInfo(classOf[DamerauLevenshteinExpression].getName, "dl_distance"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"dl_distance expects exactly 2 arguments, got ${exprs.length}")
        DamerauLevenshteinExpression(exprs.head, exprs(1))
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProductDExpression].getName, "dot_d"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"dot_d expects exactly 2 arguments, got ${exprs.length}")
        DotProductDExpression(exprs.head, exprs(1))
      },
    ))
  }
}
