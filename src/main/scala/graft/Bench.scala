package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 1-min loadavg sampled at start AND end of the run: a contended box
    // is then visible IN the record (round 19's 35->53 s driver swing
    // needed a judge re-bench to attribute to load; now the evidence
    // ships with the sample)
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadStart = loadAvg()
    val spark = GraftSession.local("graft-bench", cpus)
    // Headline set only (Catalog.benchNames); a full-catalog run is
    // available via SPARK_GRAFT_BENCH_ALL=1.
    val names0 =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ALL")) queries.Catalog.all.map(_.name)
      else queries.Catalog.benchNames
    // comma-separated subset filter for targeted A/B runs (tooling only;
    // the driver never sets it, so round benches always run the full set)
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(only) =>
        val want = only.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val got = names0.filter(want)
        val unknown = want -- got.toSet
        // fail fast: a typo'd name silently timing zero queries would
        // publish an empty-but-"successful" record into an A/B log
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_ONLY names not in the selected set: ${unknown.mkString(", ")}")
        got
      case None => names0
    }
    // Full-catalog one-rep sweep (per-round regression radar for the
    // ~75% of the catalog outside the headline set): on by default for
    // plain per-round runs; redundant under BENCH_ALL (everything is
    // already in `names`) and wrong for targeted BENCH_ONLY A/B runs.
    val sweepNames: Seq[String] =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ALL") ||
          sys.env.contains("SPARK_GRAFT_BENCH_ONLY") ||
          sys.env.contains("SPARK_GRAFT_BENCH_NOSWEEP")) Seq.empty
      else queries.Catalog.all.map(_.name).filterNot(names.toSet)
    // Untimed warmup at the smallest SF: JIT/codegen/classloading otherwise
    // lands entirely on whichever query happens to run first (~5s skew).
    // Each query warms independently so one failure can't skip the rest.
    // HEADLINE QUERIES ONLY here: warming the full catalog before the
    // gated loop measurably slowed every headline rep ~25% (codegen
    // cache + loaded-class pressure from 115 extra plans; measured
    // 34.2s vs 27.3s total, round 12) — the sweep warms itself later,
    // after the headline numbers are already banked.
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    // Best-of-3 per query: single-run local timings swing 2-3x with GC and
    // JIT recompilation; the min is the stable, reproducible figure. Only
    // SUCCESSFUL reps count - a rep that throws must not publish its
    // time-to-failure as a (fast-looking) timing. All-failed -> null in
    // `queries` plus an entry in `failed`, so a consumer summing the map
    // reconciles with `total` and can never mistake a marker for a timing.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    // Reset session-held executor state between reps. localCheckpoint'ing
    // operators (the CC loop, the composed flagships) leave cached-RDD
    // blocks behind; the ContextCleaner reclaims them only asynchronously
    // after GC, so over a 20+-query run dead blocks from earlier queries
    // steal unified memory from the one being timed (measured: the same
    // 4-query subset ran 2.5x faster than inside the full catalog sweep,
    // BENCH_r10/r11). Dropping dead blocks synchronously isolates each
    // rep the way a per-job cluster session would be isolated.
    def reset(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // Spread gate: the published figure is min-of-reps, so what must be
    // reproducible is the FAST cluster of reps, not the noise outliers.
    // After the base reps, keep adding reps (up to `maxReps`) while the
    // 3 fastest successful reps still disagree by more than the gate —
    // BENCH_r11's t_dedup_multimodal [11.9, 5.0, 5.1] showed a single
    // GC/JIT-skewed rep can land anywhere in the sequence (t_boilerplate's
    // outlier was rep 2), so a fixed warm-up can't bound the spread; only
    // re-measuring can. All reps are still published verbatim.
    val spreadGate = sys.env.getOrElse("SPARK_GRAFT_BENCH_SPREAD_GATE", "1.5").toDouble
    val maxReps = reps + 3
    def fastSpread(v: Seq[Double]): Double = {
      val best = v.sorted.take(3)
      if (best.isEmpty) 1.0 else best.max / best.min
    }
    val results: Seq[(String, Seq[Double])] = names.map { name =>
      val fn = SparkEntry.queries(name)
      // one untimed rep at the TARGET SF first: the sf0.001 warmup above
      // covers JIT/codegen but not shuffle-file and page-cache effects at
      // the measured size, which otherwise land on rep 1 (~2x skew)
      reset()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      def rep(): Option[Double] = {
        // settle the heap before EVERY rep, not just per query: carried
        // garbage otherwise lands as GC pauses inside whichever rep the
        // collector picks, which is what made published reps swing 4x on
        // a noisy machine (BENCH_r06/r07)
        reset()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => None }
      }
      var times = (1 to reps).flatMap(_ => rep())
      var attempts = reps
      while (times.nonEmpty && fastSpread(times) > spreadGate && attempts < maxReps) {
        times = times ++ rep()
        attempts += 1
      }
      // Still over the gate after maxReps = sustained machine-load noise,
      // not a one-off outlier. Retry the whole measurement ONCE (a fresh
      // batch of `reps` after a settle pause — transient load is usually
      // gone seconds later); BENCH_r13 published 6 gate-violating queries
      // that an idle rerun showed were pure load artifacts.
      if (times.nonEmpty && fastSpread(times) > spreadGate) {
        Thread.sleep(2000)
        times = times ++ (1 to reps).flatMap(_ => rep())
      }
      name -> times
    }
    // Queries whose FINAL fast-3 spread still violates the gate: their
    // published min is load-contaminated, not reproducible. They publish
    // (a number beats absence) but carry the flag so a round-over-round
    // comparison can exclude them instead of chasing phantom regressions.
    val noisyNames = results.collect {
      case (k, v) if v.nonEmpty && fastSpread(v) > spreadGate => k
    }
    val noisy = noisyNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    // FULL-spread outliers: the fast-3 gate can pass while a single rep
    // spiked 4x under contention (round 19: t_dedup_multimodal 32.8 s
    // against an 8 s median left no trace in `noisy`). A full max/min
    // spread past 3x flags the sample as taken on a busy box even when
    // the published min is fine — the per-query trace the cross-round
    // gradient adjudication needs.
    val spreadOutlierNames = results.collect {
      case (k, v) if v.size >= 2 && v.max / v.min > 3.0 => k
    }
    val spreadOutliers =
      spreadOutlierNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.minOption.fold("null")(_.toString) }
      .mkString("{", ",", "}")
    // every successful rep, so a reader can see the published number is
    // min-of-n rather than a single (possibly GC-skewed) run
    val allReps = results
      .map { case (k, v) => s"\"" + k + "\":" + v.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    // medians + max/min spread: the gate for machine noise — a spread
    // near 1.0 means the published min is reproducible, not a fluke
    def median(v: Seq[Double]): Double = {
      val s = v.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val medians = results
      .map { case (k, v) => s"\"" + k + "\":" + (if (v.isEmpty) "null" else median(v).toString) }
      .mkString("{", ",", "}")
    val spreads = results
      .map { case (k, v) =>
        s"\"" + k + "\":" + (if (v.isEmpty) "null" else (v.max / v.min).toString)
      }
      .mkString("{", ",", "}")
    // the gated metric: agreement of the 3 fastest reps (what min-of-reps
    // actually depends on); the adaptive loop above drives this <= gate
    val spreadsFast = results
      .map { case (k, v) =>
        s"\"" + k + "\":" + (if (v.isEmpty) "null" else fastSpread(v).toString)
      }
      .mkString("{", ",", "}")
    // One-rep full-catalog sweep (after the headline loop so its warmup
    // and cache pollution can't touch the gated figures). Per-query
    // isolation via the same reset(); a failed sweep query publishes
    // null, not absence, so a disappeared query is distinguishable from
    // a skipped sweep.
    sweepNames.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    val sweepTimes: Seq[(String, Option[Double])] = sweepNames.map { n =>
      val fn = SparkEntry.queries(n)
      reset()
      val t0 = System.nanoTime()
      n -> (try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
            catch { case _: Throwable => None })
    }
    val sweepJson = sweepTimes
      .map { case (k, v) => s"\"" + k + "\":" + v.fold("null")(_.toString) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v.isEmpty => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2.minOption).sum
    // The driver tail-captures stdout with a fixed-size buffer and parses the
    // LAST line as the round's bench record. Round 8 put everything (reps +
    // medians + spread for 17 queries) on that one line and it outgrew the
    // capture -> BENCH_r08 "parsed": null. So: the full diagnostic blob goes
    // to a sidecar file and an EARLIER stdout line, and the final line is a
    // compact summary (total + min-of-reps per query) that stays parseable
    // no matter how many queries the headline set grows to.
    val loadEnd = loadAvg()
    val detail =
      s"""{"metric":"detail","medians":$medians,"spread":$spreads,"spread_fast3":$spreadsFast,"noisy":$noisy,"spread_outliers":$spreadOutliers,"reps":$allReps,"sweep":$sweepJson,"loadavg_1m_start":$loadStart,"loadavg_1m_end":$loadEnd,"sf":"$sfDir"}"""
    try {
      val out = java.nio.file.Paths.get("bench_detail.json")
      java.nio.file.Files.write(out, (detail + "\n").getBytes("UTF-8"))
      // full-catalog regression radar as its own round-diffable artifact:
      // headline mins + sweep one-reps = a time for every catalog query
      val sweepOut = java.nio.file.Paths.get("sweep_latest.json")
      val sweepDoc =
        s"""{"sf":"$sfDir","headline_min":$qs,"sweep_1rep":$sweepJson}"""
      java.nio.file.Files.write(sweepOut, (sweepDoc + "\n").getBytes("UTF-8"))
      // VERSIONED sample artifact: bench_detail.json is overwritten by
      // whoever benches last (round 19: the driver's contended run
      // clobbered the builder's final-tree samples and the per-query
      // gradient analysis became unrecomputable). A labeled run also
      // writes BENCH_SAMPLES_<label>.json — commit these so every
      // published claim has its per-query reps + box load on record.
      sys.env.get("SPARK_GRAFT_BENCH_LABEL").foreach { label =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"BENCH_SAMPLES_$label.json"),
          (detail + "\n").getBytes("UTF-8"))
      }
    } catch { case _: Throwable => () }
    println(detail)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"noisy":$noisy,"spread_outliers":$spreadOutliers,"loadavg_1m_start":$loadStart,"loadavg_1m_end":$loadEnd,"sf":"$sfDir"}""")
    spark.stop()
  }
}
