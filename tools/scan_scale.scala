// Big-replica events table: zone-map-pruned stored-table box scan vs the
// raw parquet filter - the SCALING.md row for the layout tier. Run via:
//   GRAFT_SCAN_REPLICAS=1000 spark-shell -cp target/scala-2.13/classes \
//     -i tools/scan_scale.scala < /dev/null
// ASCII only (spark-shell slurps with the platform charset).
//
// Replication multiplies event_id (disjoint ids) and keeps the user/day
// domains, so the demo box selects the SAME fraction of an N-times
// table - the honest regime for measuring file skipping (shifting users
// too would let the box hit one replica and flatter the result).

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

val s = graft.GraftSession.local("graft-scanN", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
s.sparkContext.setLogLevel("ERROR")

val src = sys.env.getOrElse("GRAFT_SCAN_SRC", "/root/testdata/sf0.1")
val n = sys.env.getOrElse("GRAFT_SCAN_REPLICAS", "1000").toInt
val nFiles = sys.env.getOrElse("GRAFT_SCAN_FILES", "64").toInt
val dest = s"/tmp/graft_events${n}x"
val tableDir = s"$dest/ztable"

val marker = Paths.get(s"$dest/_OK")
val stamp = s"src=$src replicas=$n files=$nFiles"
val fresh = Files.exists(marker) &&
  new String(Files.readAllBytes(marker), "UTF-8").trim == stamp
if (!fresh) {
  println(s"[scanN] building ${n}x events of $src")
  Files.deleteIfExists(marker)
  Files.createDirectories(Paths.get(dest))
  // spread the single-file source over nFiles tasks FIRST, then fan out
  // per task: id = id * n + rep keeps replica id spaces disjoint
  val base = s.read.parquet(s"$src/events.parquet").repartition(nFiles)
  val all = base
    .withColumn("rep", explode(sequence(lit(0L), lit(n - 1L))))
    .withColumn("event_id", col("event_id") * n + col("rep"))
    .drop("rep")
  all.write.mode("overwrite").parquet(s"$dest/events.parquet")
  val evs = graft.sources.Tables.events(s, dest)
  graft.queries.LayoutOps.writeEventTable(evs, tableDir, nFiles = nFiles)
  Files.write(marker, stamp.getBytes("UTF-8"))
  println("[scanN] build done")
} else println(s"[scanN] reusing $dest")

val (uLo, uHi, dLo, dHi) = (0L, 24L, 19738L, 19748L) // the e_table_scan box

def time(reps: Int)(f: => Long): (Double, Long) = {
  f // warmup
  val runs = (1 to reps).map { _ =>
    System.gc()
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }
  (runs.map(_._1).min, runs.head._2)
}

val (tRaw, nRaw) = time(3) {
  graft.sources.Tables.events(s, dest)
    .withColumn("day", expr("ts_sec div 86400"))
    .filter(col("user_id").between(uLo, uHi) && col("day").between(dLo, dHi))
    .count()
}
val (tPruned, nPruned) = time(3) {
  graft.queries.LayoutOps.eventTableBoxScan(s, tableDir, uLo, uHi, dLo, dHi).count()
}
require(nRaw == nPruned, s"row mismatch: raw=$nRaw pruned=$nPruned")

// file + byte census from the zone map and the filesystem
val zm = graft.sources.IndexManifest
  .readAppendOnly(s, tableDir, "zonemap", graft.sources.IndexManifest.Layout)
  .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
val hit = zm.filter { case (_, ul, uh, dl, dh) => !(uh < uLo || ul > uHi || dh < dLo || dl > dHi) }
def bytesOf(uri: String): Long =
  Files.size(Paths.get(new java.net.URI(uri).getPath))
val hitBytes = hit.map(f => bytesOf(f._1)).sum
val allBytes = zm.map(f => bytesOf(f._1)).sum
val total = s.read.parquet(s"$dest/events.parquet").count()

println(s"[scanN] table rows=" + total + " box rows=" + nRaw)
println(s"[scanN] files: " + hit.length + " of " + zm.length + " zone-intersecting; bytes " +
  (hitBytes >> 20) + " MiB of " + (allBytes >> 20) + " MiB")
println(f"[scanN] raw filter scan : $tRaw%.2f s (min-of-3)")
println(f"[scanN] zone-map scan   : $tPruned%.2f s (min-of-3)")
System.exit(0)
