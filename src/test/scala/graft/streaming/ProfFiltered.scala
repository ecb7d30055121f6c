package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.VectorOps
import graft.sources.Tables

/** Paired A/B/C of the cascade serve UNFILTERED vs per-request
  * `keepPairs` at two selectivities (1/2 and 1/16) — alternating reps
  * in ONE session (the ProfServe discipline: cross-run variance spans
  * 2x on this box; only paired samples support probe-vs-probe claims).
  * What this measures honestly at toy scale: the filtered serve pays
  * the pairs-relation JOIN (materialized per batch) against whatever
  * the smaller screen/decode/fetch tiers save — at sf0.1 the corpus
  * is small enough that tier costs are job floors, so the interesting
  * number is whether the pairs join ADDS a floor, not the asymptotic
  * saving (which is a plan property: the semi-join prunes the
  * 8 B/vector scan and every downstream fetch; see SCALING.md).
  * Usage: `sbt "Test/runMain graft.streaming.ProfFiltered [sfDir] [reps]"`.
  */
object ProfFiltered {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val replicas = 2
    val s = graft.GraftSession.local("prof-filtered", "32")
    import s.implicits._
    graft.functions.GraftFunctions.registerDotD(s)
    val emb = Tables.embeddings(s, sfDir)
    def tmp() = java.nio.file.Files.createTempDirectory("pfilt").toString
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
    // standing eligibility relations at two selectivities, built once
    // (the deployment shape: the relation is the predicate's output,
    // not a per-batch recomputation) — request q keeps ids with
    // vec_id % m == q % m
    def pairsMod(m: Int) = {
      val p = staged.select($"query_id", ($"query_id" % m).as("k"))
        .join(emb.select($"vec_id", ($"vec_id" % m).as("k")), Seq("k"))
        .select($"query_id", $"vec_id")
      val dir = tmp()
      p.write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
    }
    val pairs2 = pairsMod(2)
    val pairs16 = pairsMod(16)
    def reqStream = s.readStream
      .schema("query_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", "2").parquet(rStage)
    def time(run: () => org.apache.spark.sql.streaming.StreamingQuery): Double = {
      val t0 = System.nanoTime()
      val q = run(); q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to reps).foreach { i =>
      val a = time(() => Streams.cascadeServeStream(
        reqStream, bqIdx, sqIdx, emb, tmp(), tmp(),
        trigger = Some(Trigger.AvailableNow())))
      println(f"PAIR rep=$i unfiltered_secs=$a%.2f rps=${nReq / a}%.0f")
      val b = time(() => Streams.cascadeServeStream(
        reqStream, bqIdx, sqIdx, emb, tmp(), tmp(),
        trigger = Some(Trigger.AvailableNow()), keepPairs = Some(pairs2)))
      println(f"PAIR rep=$i pairs_half_secs=$b%.2f rps=${nReq / b}%.0f")
      val c = time(() => Streams.cascadeServeStream(
        reqStream, bqIdx, sqIdx, emb, tmp(), tmp(),
        trigger = Some(Trigger.AvailableNow()), keepPairs = Some(pairs16)))
      println(f"PAIR rep=$i pairs_16th_secs=$c%.2f rps=${nReq / c}%.0f")
    }
    s.stop()
  }
}
