package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JSONL edge round-trips: schema'd read parity with the parquet table,
  * malformed-line and missing-identity-field dropping, and the
  * one-file-per-shard export layout.
  */
class JsonlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("jsonl round-trip equals the parquet documents table") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("jsonl-rt").toString
    docs.write.mode("overwrite").json(s"$dir/docs")
    val back = Jsonl.documents(spark, s"$dir/docs")
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = back.select(docs.columns.map(col): _*)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("malformed lines and identity-less objects are dropped, valid lines kept") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl-bad").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/part.jsonl"),
      Seq(
        """{"doc_id": 1, "text": "good line", "lang": "en", "source": "web", "n_chars": 9}""",
        """this is not json at all""",
        """{"doc_id": 2, "lang": "en"}""", // parseable but no text -> dropped
        """{"text": "no id", "lang": "en"}""", // no doc_id -> dropped
        """{"doc_id": 3, "text": "also good"}""", // missing optionals -> kept
      ).mkString("\n").getBytes("UTF-8"))
    val out = Jsonl.documents(spark, s"$dir/part.jsonl")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "good line"), (3L, "also good")))
  }

  test("writeShards lays out one file per shard, round-trips, keeps in-shard order") {
    import spark.implicits._
    val df = Seq(
      (5L, "e", 1L), (1L, "a", 0L), (2L, "b", 0L), (4L, "d", 1L), (3L, "c", 0L),
    ).toDF("doc_id", "text", "shard_id")
    val dir = java.nio.file.Files.createTempDirectory("jsonl-shards").toString
    val n = Jsonl.writeShards(df, s"$dir/out")
    assert(n == 5L)
    for (shard <- Seq(0, 1)) {
      val files = new java.io.File(s"$dir/out/shard_id=$shard")
        .listFiles().filter(_.getName.endsWith(".json"))
      assert(files.length == 1, s"shard $shard should be exactly one file")
      val ids = scala.io.Source.fromFile(files.head).getLines()
        .map(l => """"doc_id":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong).toSeq
      assert(ids == ids.sorted, s"shard $shard not id-ordered")
    }
    val back = spark.read.json(s"$dir/out")
    assert(back.count() == 5L)
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L))
  }
}
