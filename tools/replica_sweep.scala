// Build the N-times replica corpus and run the duplicate-heavy sweep.
// Run via tools/replica_sweep.sh (spark-shell -i; ASCII only - the REPL
// reads this with the platform charset).
//
// Replica construction (the SCALING.md "5x beyond the driver's bench SF"
// corpus): fact tables replicated REPLICAS times with shifted keys so the
// key spaces stay disjoint (orderkey / doc_id / vec_id), dimensions kept
// single-copy. Payloads are NOT perturbed - five exact copies of every
// document/embedding is the point: it is the adversarial duplicate-heavy
// regime for the LSH/near-dup operators, where the composed
// exact-dedup-first pipelines must hold their advantage over the raw
// pairwise verifiers.
//
// Env knobs (all optional):
//   GRAFT_REPLICA_SRC   source SF dir      (default /root/testdata/sf0.1)
//   GRAFT_REPLICA_DEST  replica dir        (default /tmp/graft_replica5)
//   GRAFT_REPLICAS      copies             (default 5)
//   GRAFT_REPLICA_REPS  timing reps        (default 3, min published)
//   GRAFT_REPLICA_QS    comma-sep queries  (default: the SCALING.md set)

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

val src = sys.env.getOrElse("GRAFT_REPLICA_SRC", "/root/testdata/sf0.1")
val dest = sys.env.getOrElse("GRAFT_REPLICA_DEST", "/tmp/graft_replica5")
val replicas = sys.env.getOrElse("GRAFT_REPLICAS", "5").toInt
val reps = sys.env.getOrElse("GRAFT_REPLICA_REPS", "3").toInt
val queryNames = sys.env
  .getOrElse(
    "GRAFT_REPLICA_QS",
    "q1_pricing_summary,q3_shipping_priority,t_minhash_lsh,t_simhash_neardup," +
      "t_ngram_jaccard,t_neardup_post_dedup,t_jaccard_post_dedup,t_clean_corpus," +
      "v_knn_brute,v_neardup_cosine,v_ann_lsh_multi")
  .split(",").map(_.trim).filter(_.nonEmpty).toSeq

val s = graft.GraftSession.local("graft-replica-sweep", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
s.sparkContext.setLogLevel("ERROR")

// ---- build ----
// Idempotency marker written LAST and stamped with (src, replicas): a
// half-built corpus (crash mid-write) or a rerun with different knobs
// never silently sweeps the wrong data.
val marker = Paths.get(s"$dest/_REPLICA_OK")
val stamp = s"src=$src replicas=$replicas"
val fresh = Files.exists(marker) &&
  new String(Files.readAllBytes(marker), "UTF-8").trim == stamp
if (!fresh) {
  println(s"[replica] building ${replicas}x of $src -> $dest")
  Files.deleteIfExists(marker)
  Files.createDirectories(Paths.get(dest))
  val dims = Seq("region", "nation", "customer", "supplier", "part")
  dims.foreach { t =>
    s.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$dest/$t.parquet")
  }
  // ONE shared orderkey shift for orders AND lineitem: independently
  // computed spans would desync the FK the moment one table's max key
  // drifts (every replicated lineitem row would dangle, silently
  // understating join query rows). 10x the max keeps spaces readable.
  // max over an empty table is NULL (getLong would NPE), and a max key of
  // 0 would collapse every replica onto the same key space - require a
  // strictly positive span before replicating (mirrors the shard packer's
  // empty-input guard)
  def maxKey(table: String, key: String): Long = {
    val r = s.read.parquet(s"$src/$table.parquet").agg(max(col(key))).head
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
  val orderSpan =
    math.max(maxKey("orders", "o_orderkey"), maxKey("lineitem", "l_orderkey")) * 10L
  def shifted(table: String, keys: Seq[String], spanIn: Long = -1L): Unit = {
    val base = s.read.parquet(s"$src/$table.parquet")
    val span = if (spanIn > 0) spanIn else maxKey(table, keys.head) * 10L
    require(span > 0L,
      s"[replica] $table: empty source or max(${keys.head}) = 0 - refusing to " +
        "replicate onto overlapping key spaces")
    val all = (0 until replicas)
      .map(i => keys.foldLeft(base)((d, k) => d.withColumn(k, col(k) + lit(i * span))))
      .reduce(_ unionAll _)
    all.write.mode("overwrite").parquet(s"$dest/$table.parquet")
  }
  require(orderSpan > 0L, "[replica] empty orders/lineitem source - nothing to replicate")
  shifted("orders", Seq("o_orderkey"), orderSpan)
  shifted("lineitem", Seq("l_orderkey"), orderSpan)
  shifted("documents", Seq("doc_id"))
  shifted("embeddings", Seq("vec_id"))
  // events: replicated unshifted is wrong (duplicate event_ids) and the
  // timestamp physical type does not round-trip the NANOS reader config;
  // the events pack is swept at driver SFs instead - copy single-copy so
  // catalog queries that scan it still resolve
  s.read.parquet(s"$src/events.parquet").write.mode("overwrite").parquet(s"$dest/events.parquet")
  Files.write(marker, stamp.getBytes("UTF-8"))
  println("[replica] build done")
} else println(s"[replica] reusing existing $dest ($stamp)")

// ---- sweep ----
println(s"[replica] sweeping ${queryNames.length} queries, min-of-$reps")
val rows = queryNames.map { name =>
  val fn = graft.SparkEntry.queries(name)
  try fn(s, dest).count() catch { case _: Throwable => () } // warmup
  val times = (1 to reps).flatMap { _ =>
    System.gc()
    val t0 = System.nanoTime()
    try {
      val n = fn(s, dest).count()
      Some(((System.nanoTime() - t0) / 1e9, n))
    } catch { case e: Throwable => println(s"[replica] $name failed: $e"); None }
  }
  val best = times.map(_._1).minOption
  val outRows = times.headOption.map(_._2)
  println(f"[replica] $name%-24s ${best.fold("FAILED")(t => f"$t%.2f s")}  rows=${outRows.getOrElse(-1L)}")
  (name, best, outRows)
}

println()
println(s"| query | ${replicas}x ${src.split('/').last} (min-of-$reps) | rows |")
println("|---|---|---|")
rows.foreach { case (n, t, r) =>
  println(s"| $n | ${t.fold("FAILED")(x => f"$x%.2f s")} | ${r.getOrElse(-1L)} |")
}
System.exit(0)
