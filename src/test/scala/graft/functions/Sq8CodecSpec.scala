package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sq8 v2 codec expressions in isolation: pack/decode round-trip,
  * the low-byte mask, null/length semantics, and interpreted-vs-codegen
  * agreement (both paths execute — the whole-stage threshold knob
  * forces each in turn).
  */
class Sq8CodecSpec extends SparkSpec {

  private def withCodegen[A](on: Boolean)(f: => A): A = {
    val k = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(k)
    spark.conf.set(k, on.toString)
    try f finally spark.conf.set(k, old)
  }

  test("pack round-trips the quantizer's [0,255] range and masks to the low byte") {
    import spark.implicits._
    GraftFunctions.registerSq8(spark)
    val codes: Seq[Long] = (0L to 255L) ++ Seq(256L, 511L, -1L)
    val out = Seq(Tuple1(codes)).toDF("c")
      .select(GraftFunctions.sq8Pack($"c").as("bin"))
      .collect().head.getAs[Array[Byte]](0)
    assert(out.length === codes.length)
    // in-range values round-trip exactly; out-of-range values (which
    // the encoder never emits) take the documented low-byte mask
    assert(out.take(256).map(b => (b & 0xFF).toLong).toSeq === (0L to 255L))
    assert((out(256) & 0xFF) === 0 && (out(257) & 0xFF) === 255 &&
      (out(258) & 0xFF) === 255)
  }

  test("decode equals the v1 lambda bit for bit, interpreted and codegen'd") {
    import spark.implicits._
    GraftFunctions.registerSq8(spark)
    val rnd = new scala.util.Random(7)
    val dim = 64
    val lo = Array.fill(dim)(rnd.nextGaussian())
    // one degenerate constant dim: hi == lo must decode to lo
    val hi = lo.zipWithIndex.map { case (l, i) =>
      if (i == 5) l else l + math.abs(rnd.nextGaussian()) + 1e-3 }
    val rows = (0 until 20).map { i =>
      (i.toLong, Seq.fill(dim)(rnd.nextInt(256).toLong), lo.toSeq, hi.toSeq)
    }
    val df = rows.toDF("id", "codes", "lo", "hi")
    val v1 = df.withColumn("r", expr(
        """transform(codes, (c, i) ->
          |  lo[i] + (CAST(c AS DOUBLE) + 0.5D) * (hi[i] - lo[i]) / 255.0D)""".stripMargin))
      .select($"id", $"r").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def v2(codegen: Boolean) = withCodegen(codegen) {
      df.select($"id",
          GraftFunctions.sq8Decode(
            GraftFunctions.sq8Pack($"codes"), $"lo", $"hi").as("r"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    }
    // bit-exact, not approximate: the decode IS the stored-serve hash
    assert(v2(codegen = true) === v1)
    assert(v2(codegen = false) === v1)
    assert(v1(0L)(5) === lo(5), "a degenerate constant dim decodes to lo")
  }

  test("null and length semantics fail closed") {
    import spark.implicits._
    GraftFunctions.registerSq8(spark)
    val lo = Seq.fill(4)(0.0); val hi = Seq.fill(4)(1.0)
    // stats arrays shorter than the code vector -> NULL row, not garbage
    val short = Seq((Array.fill[Byte](8)(1), lo, hi)).toDF("bin", "lo", "hi")
      .select(GraftFunctions.sq8Decode($"bin", $"lo", $"hi").as("r"))
      .collect().head
    assert(short.isNullAt(0))
    // null binary -> NULL
    val nul = Seq((Option.empty[Array[Byte]], lo, hi)).toDF("bin", "lo", "hi")
      .select(GraftFunctions.sq8Decode($"bin", $"lo", $"hi").as("r"))
      .collect().head
    assert(nul.isNullAt(0))
  }
}
