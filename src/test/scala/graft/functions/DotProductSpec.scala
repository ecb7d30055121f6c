package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotProductSpec extends SparkSpec {

  private val hofDot = expr("""aggregate(
    zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
    CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")

  test("dot_d is bit-identical to the HOF fold it replaces") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // adversarial floats: denormals-ish, sign flips, magnitude spread —
    // summation order differences would surface here
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = Array.fill(64)((rnd.nextFloat() - 0.5f) * math.pow(10, rnd.nextInt(8) - 4).toFloat)
      val b = Array.fill(64)((rnd.nextFloat() - 0.5f) * math.pow(10, rnd.nextInt(8) - 4).toFloat)
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(expr("dot_d(a, b)")).collect().map(_.getDouble(0))
    val want = df.select(hofDot).collect().map(_.getDouble(0))
    got.zip(want).foreach { case (g, w) =>
      assert(java.lang.Double.doubleToRawLongBits(g) === java.lang.Double.doubleToRawLongBits(w))
    }
  }

  test("dot_d null semantics match zip_with padding") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f), Array(3f, 4f)), // ok
    ).toDF("a", "b")
    assert(df.select(expr("dot_d(a, b)")).first().getDouble(0) === 11.0)
    // length mismatch -> NULL (zip_with pads the short side with NULL)
    val mism = spark.sql("SELECT dot_d(array(CAST(1 AS FLOAT)), array(CAST(1 AS FLOAT), CAST(2 AS FLOAT))) AS v")
    assert(mism.first().isNullAt(0))
    // null element -> NULL
    val withNull = spark.sql(
      "SELECT dot_d(array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(1 AS FLOAT), CAST(2 AS FLOAT))) AS v")
    assert(withNull.first().isNullAt(0))
    // null array -> NULL
    val nullArr = spark.sql("SELECT dot_d(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1 AS FLOAT))) AS v")
    assert(nullArr.first().isNullAt(0))
  }

  test("dot_d fuses into whole-stage codegen") {
    GraftFunctions.register(spark)
    val plan = spark.range(4)
      .selectExpr("array(CAST(id AS FLOAT)) AS a")
      .selectExpr("dot_d(a, a) AS v")
      .queryExecution.executedPlan.toString
    // `*(n)` marks a whole-stage-codegen'd operator; the Project hosting
    // dot_d must carry it (CodegenFallback would strip it)
    assert(plan.linesIterator.exists(l => l.contains("dot_d") && l.trim.startsWith("*(")), plan)
  }
}
