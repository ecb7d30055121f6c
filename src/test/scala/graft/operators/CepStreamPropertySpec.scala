package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.OrderEvent

/** Randomized property tests for [[Cep.followedByStreaming]]'s wrapper
  * around the scan — watermark expiry, state snapshot/restore through the
  * encoder, timeout timers — under ARBITRARY micro-batch splits.
  *
  * Two laws, by split type:
  *   - conservation (any split, even ones that deliver events late
  *     across batches): every step-0 event opens exactly one run and
  *     every run dies exactly once, so the output count equals the
  *     step-0 event count and the multiset of (key, firstTs) equals the
  *     multiset of step-0 (key, ts) — channel totals are stable however
  *     arrival order shuffles WHICH channel each run lands on;
  *   - full batch parity when splits respect event-time order (the
  *     reference's ascending-watermark regime): the streamed channel
  *     outputs equal followedByBatch exactly.
  */
class CepStreamPropertySpec extends SparkSpec {

  private val orderTie = (e: OrderEvent) => if (e.eventType == "create") 0L else 1L
  private val createThenPay = Seq(
    (e: OrderEvent) => e.eventType == "create",
    (e: OrderEvent) => e.eventType == "pay")

  private def randomEvents(rnd: scala.util.Random, n: Int, keys: Int): Vector[OrderEvent] = {
    var ts = 1000L
    Vector.fill(n) {
      ts += rnd.nextInt(4)
      val t = rnd.nextInt(10) match {
        case x if x < 4 => "create"
        case x if x < 8 => "pay"
        case _ => "noise"
      }
      OrderEvent(rnd.nextInt(keys).toLong + 1L, t, s"tx$ts", ts)
    }
  }

  /** Feed chunks through a memory-sink streaming query and collect. */
  private def streamed(
      chunks: Seq[Seq[OrderEvent]],
      windowSec: Long,
      name: String,
      delaySec: Long = 0L, // must cover the lateness span or Spark drops rows
  ): Seq[(String, Long, Long, Long, Int)] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[OrderEvent]
    val src = mem.toDS()
      .withColumn("eventTime", timestamp_seconds(col("timestamp")))
      .withWatermark("eventTime", s"$delaySec seconds")
      .as[OrderEvent]
    val q = Cep
      .followedByStreaming[OrderEvent](
        src, _.orderId, _.timestamp, orderTie, createThenPay, windowSec)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ckpt-$name").toString)
      .start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      // push the watermark (maxEventTime - delay) past every open deadline
      val maxTs = chunks.flatten.map(_.timestamp).max
      mem.addData(Seq(OrderEvent(-1L, "noop", "", maxTs + delaySec + 10 * windowSec)))
      q.processAllAvailable()
      mem.addData(Seq.empty[OrderEvent])
      q.processAllAvailable()
      spark.table(name).as[Out[Cep.FollowedMatch]].collect().toSeq
        .map(o => (o.channel, o.value.key, o.value.firstTs, o.value.lastTs, o.value.matched))
    } finally q.stop()
  }

  test("conservation under adversarial splits: every open emits exactly once") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 2) {
      val evs = randomEvents(rnd, 400, keys = 12)
      // random split points with NO time alignment: later chunks deliver
      // events older than already-seen ones (cross-batch lateness)
      val shuffled = rnd.shuffle(evs)
      val cuts = Seq(shuffled.length / 3, 2 * shuffled.length / 3)
      val chunks = Seq(
        shuffled.slice(0, cuts(0)),
        shuffled.slice(cuts(0), cuts(1)),
        shuffled.slice(cuts(1), shuffled.length))
      // delay covers the whole event-time span: with a shorter delay Spark
      // itself drops sub-watermark rows ahead of the operator (by design —
      // the batch-parity caveat in the class doc), which would break the
      // conservation law at the SOURCE, not in the operator under test
      val span = evs.map(_.timestamp).max - evs.map(_.timestamp).min + 1
      val out = streamed(chunks, windowSec = 20L, s"cep_conserve_$trial", delaySec = span)
      val opens = evs.filter(_.eventType == "create")
      assert(out.length === opens.length, s"trial $trial: emissions != opens")
      assert(
        out.map(o => (o._2, o._3)).sorted === opens.map(e => (e.orderId, e.timestamp)).sorted,
        s"trial $trial: (key, firstTs) multiset diverged")
    }
  }

  test("batch parity when micro-batches respect event-time order") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val evs = randomEvents(rnd, 500, keys = 15)
      .sortBy(e => (e.timestamp, orderTie(e)))
    // split at strict ts boundaries so no event arrives late
    def cutAt(i0: Int): Int = {
      var i = i0
      while (i < evs.length && evs(i - 1).timestamp >= evs(i).timestamp) i += 1
      i
    }
    val c1 = cutAt(evs.length / 3)
    val c2 = cutAt(math.max(c1 + 1, 2 * evs.length / 3))
    val chunks = Seq(evs.slice(0, c1), evs.slice(c1, c2), evs.slice(c2, evs.length))
    val got = streamed(chunks, windowSec = 20L, "cep_parity").toSet
    val want = Cep
      .followedByBatch[OrderEvent](
        spark.createDataset(evs), _.orderId, _.timestamp, orderTie, createThenPay, 20L)
      .collect()
      .map(o => (o.channel, o.value.key, o.value.firstTs, o.value.lastTs, o.value.matched))
      .toSet
    assert(got === want)
    assert(got.exists(_._1 == Out.Main) && got.exists(_._1 == Out.Timeout))
  }
}
