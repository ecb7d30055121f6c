package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd `nfc(s)` expression: canonical composition semantics,
  * identity on ASCII, null propagation, and behavior through the
  * whole-stage-codegen path (a real DataFrame projection, not just
  * interpreted eval). All non-ASCII inputs are written as \\u escapes so
  * the test is immune to source-file normalization.
  */
class NfcNormalizeSpec extends SparkSpec {

  private def nfcOf(ss: Seq[String]): Seq[String] = {
    import spark.implicits._
    GraftFunctions.registerNfc(spark)
    ss.toDF("s").select(expr("nfc(s)").as("n")).collect().map(_.getString(0)).toSeq
  }

  test("decomposed sequences compose: e + U+0301 becomes U+00E9") {
    val decomposed = "cafe\u0301" // cafe + combining acute accent
    val composed = "caf\u00e9"
    assert(decomposed != composed) // different codepoints before NFC
    assert(nfcOf(Seq(decomposed)) == Seq(composed))
    // already-composed input is untouched
    assert(nfcOf(Seq(composed)) == Seq(composed))
  }

  test("matches java.text.Normalizer on a mixed batch, ASCII is identity") {
    val inputs = Seq(
      "plain ascii text 123",
      "A\u030angstro\u0308m", // A + ring, o + diaeresis, decomposed
      "\u1e69", // s with dot below and dot above, precomposed
      "s\u0323\u0307", // same letter, fully decomposed
      "",
    )
    val expected = inputs.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(nfcOf(inputs) == expected)
    // the two spellings of the same letter converge
    assert(nfcOf(Seq("\u1e69")).head == nfcOf(Seq("s\u0323\u0307")).head)
    assert(nfcOf(Seq("plain ascii text 123")) == Seq("plain ascii text 123"))
  }

  test("null propagates") {
    import spark.implicits._
    GraftFunctions.registerNfc(spark)
    val out = Seq(Some("a"), None).toDF("s")
      .select(expr("nfc(s)").as("n")).collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("a"), None))
  }

  test("t_norm_key collapses cosmetic variants to one key on a planted frame") {
    import spark.implicits._
    // drive the published operator over a temp parquet dir shaped like the
    // documents table — cosmetic variants of one article + one distinct doc
    val docs = Seq(
      (1L, "The Quick Brown Fox, jumps!", "en", "web", 27L),
      (2L, "the quick   brown fox jumps", "en", "web", 27L),
      (3L, "THE QUICK BROWN FOX JUMPS.", "en", "web", 26L),
      (4L, "an entirely different document", "en", "web", 30L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("normkey").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextOps.normKey.spark(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("norm_key"), r.getAs[Long]("n_key_docs"),
          r.getAs[Boolean]("is_canonical"), r.getAs[Boolean]("changed"))).toMap
    assert(out(1L)._1 == out(2L)._1 && out(2L)._1 == out(3L)._1)
    assert(out(4L)._1 != out(1L)._1)
    assert(out(1L)._2 == 3L && out(4L)._2 == 1L)
    assert(out(1L)._3 && !out(2L)._3 && !out(3L)._3 && out(4L)._3)
    // docs 2 and 3's normalized forms differ from their raw text
    assert(out(2L)._4 && out(3L)._4)
  }
}
