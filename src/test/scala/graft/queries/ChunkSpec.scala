package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-boundary oracle for t_chunk: exact window starts, lengths, and
  * hashes for a hand-sized document, plus the coverage/count invariants on
  * random corpora (every token lands in at least one chunk; chunk count is
  * the closed form ceil(n/stride)).
  */
class ChunkSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("a 50-token document chunks into the exact expected windows") {
    import spark.implicits._
    val tokens = (1 to 50).map(i => s"w$i")
    val df = Seq((7L, tokens.mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.chunksOf(df)
      .orderBy($"chunk_id")
      .collect()
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("n_chunk_tokens"),
        r.getAs[String]("chunk_hash")))
    // size 32, stride 24 over 50 tokens: starts 1, 25, 49 (1-based)
    val expected = Seq(
      (0L, 32L, md5hex(tokens.slice(0, 32).mkString(" "))),
      (1L, 26L, md5hex(tokens.slice(24, 50).mkString(" "))),
      (2L, 2L, md5hex(tokens.slice(48, 50).mkString(" "))),
    )
    assert(out.toSeq === expected)
  }

  test("empty and single-token documents") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   "), (3L, "solo")).toDF("doc_id", "text")
    val out = TextOps.chunksOf(df).collect()
    // all-whitespace docs produce no chunks; a 1-token doc produces one
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(3L))
    assert(out.head.getAs[Long]("n_chunk_tokens") === 1L)
    assert(out.head.getAs[String]("chunk_hash") === md5hex("solo"))
  }

  test("random corpus: closed-form chunk count, bounded lengths, full coverage") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docsIn = (0 until 40).map { i =>
      val n = rnd.nextInt(120) // 0-119 tokens
      (i.toLong, (0 until n).map(j => s"t${i}_$j").mkString(" "))
    }
    val df = docsIn.toDF("doc_id", "text")
    val byDoc = TextOps.chunksOf(df).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("chunk_id"))).toMap
    docsIn.foreach { case (id, text) =>
      val n = text.split(" ").count(_.nonEmpty)
      val chunks = byDoc.getOrElse(id, Array.empty)
      if (n == 0) assert(chunks.isEmpty)
      else {
        // starts 1, 25, 49, ... <= n  =>  count = floor((n-1)/24) + 1
        assert(chunks.length === (n - 1) / 24 + 1, s"doc $id n=$n")
        assert(chunks.forall(_.getAs[Long]("n_chunk_tokens") <= 32L))
        // coverage: windows [1+24k, min(1+24k+31, n)] tile 1..n, because
        // stride (24) <= size (32) and the last start is > n - 24
        val covered = chunks.zipWithIndex.map { case (c, k) =>
          val start = 1 + 24 * k
          (start, start + c.getAs[Long]("n_chunk_tokens").toInt - 1)
        }
        assert(covered.head._1 === 1 && covered.last._2 === n)
        covered.sliding(2).foreach {
          case Array((_, e1), (s2, _)) => assert(s2 <= e1 + 1)
          case _                       => ()
        }
      }
    }
  }
}
