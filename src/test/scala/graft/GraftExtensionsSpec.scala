package graft

import org.apache.spark.sql.SparkSession

/** The `spark.sql.extensions=graft.GraftExtensions` deployment path: a
  * session built with the extensions hook (and no programmatic
  * GraftFunctions.register call) must resolve every injected function in
  * SQL. The hook is applied via `builder.withExtensions(new
  * GraftExtensions)` — the exact object the conf string names —
  * because `spark.sql.extensions` itself is a STATIC conf, read from the
  * SparkContext at context creation, and the suite's context is already
  * running (a spark-submit with the conf exercises the string wiring,
  * which is Spark's own loader code). A second session is created over
  * the shared SparkContext by clearing the active/default session around
  * the builder call; the suite's canonical session is restored after.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("a session built with the extensions hook resolves all injected functions in SQL") {
    val base = spark // force-start the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne base, "builder must have created a fresh session")
      import s2.implicits._

      val r = s2.sql(
        """SELECT nfc('cafe\u0301') AS n,
          |       bloom_hash('user42') AS b,
          |       dot_d(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
          |             array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d
          |""".stripMargin).head()
      assert(r.getAs[String]("n") == "caf\u00e9") // composed by the injected nfc
      // the reference's x61 polynomial fold masked to 2^29, recomputed here
      val expectedHash = "user42".foldLeft(0L)((acc, c) => acc * 61 + c) & ((1L << 29) - 1)
      assert(r.getAs[Long]("b") == expectedHash)
      assert(r.getAs[Double]("d") == (1.5 * 3.0 + 2.0 * 0.5))

      Seq("u1", "u2", "u1").toDF("userId").createOrReplaceTempView("ext_uv")
      val uv = s2.sql("SELECT bloom_uv(userId) AS uv FROM ext_uv").head().getAs[Long]("uv")
      assert(uv == 2L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
