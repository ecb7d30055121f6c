package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.VectorOps
import graft.sources.Tables

/** One-off paired A/B of serving probes 11 (2-tier BQ) and 13 (3-tier
  * cascade) — alternating reps in ONE session, so both tiers sample the
  * same machine state (the full StreamBench's cross-run variance at
  * sf0.1 spans 2x on this box, which single samples can't see through).
  * Usage: `sbt "Test/runMain graft.streaming.ProfServe [sfDir] [reps]"`.
  */
object ProfServe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val replicas = 5
    val s = graft.GraftSession.local("prof-serve", "32")
    import s.implicits._
    graft.functions.GraftFunctions.registerDotD(s)
    val emb = Tables.embeddings(s, sfDir)
    def tmp() = java.nio.file.Files.createTempDirectory("pserve").toString
    val bqIdx = tmp(); val sqIdx = tmp()
    VectorOps.writeBqIndex(emb, bqIdx)
    VectorOps.writeSq8Index(emb, sqIdx)
    val eStats = emb.agg(max($"vec_id"), count(lit(1))).first()
    val eMax = eStats.getLong(0) + 1
    val nReq = eStats.getLong(1) * replicas
    val staged = emb
      .crossJoin(s.range(replicas).select($"id".as("rep")))
      .select(($"vec_id" + $"rep" * eMax + 1000000L).as("query_id"), $"embedding")
    val rStage = tmp()
    staged.repartition(8).write.mode("overwrite").parquet(rStage)
    def reqStream = s.readStream
      .schema("query_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", "2").parquet(rStage)
    def time(run: () => org.apache.spark.sql.streaming.StreamingQuery): Double = {
      val t0 = System.nanoTime()
      val q = run(); q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to reps).foreach { i =>
      val a = time(() => Streams.annServeStream(
        reqStream, bqIdx, emb, tmp(), tmp(), trigger = Some(Trigger.AvailableNow())))
      println(f"PAIR rep=$i p11_secs=$a%.2f p11_rps=${nReq / a}%.0f")
      val b = time(() => Streams.cascadeServeStream(
        reqStream, bqIdx, sqIdx, emb, tmp(), tmp(),
        trigger = Some(Trigger.AvailableNow())))
      println(f"PAIR rep=$i p13_secs=$b%.2f p13_rps=${nReq / b}%.0f")
    }
    s.stop()
  }
}
