package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: encode parity, exactness of the bucket-pruned box
  * scan, and the actual pruning — on BOTH dimensions, the property a
  * 1-D sort cannot give.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("engine morton2 equals the driver twin and is invertible on the grid") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.tabulate(200)(_ =>
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong)) ++
      Seq((0L, 0L), ((1L << 31) - 1, (1L << 31) - 1), (1L, 0L), (0L, 1L))
    val got = pairs.toDF("x", "y")
      .select($"x", $"y", LayoutOps.morton2($"x", $"y").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === LayoutOps.morton2Long(x, y), s"($x,$y)")
    }
    // interleave is injective: distinct pairs -> distinct z
    assert(got.values.toSet.size === got.size)
    // the domain contract holds on both twins: out-of-range dims fail
    // fast instead of silently degrading the layout
    intercept[IllegalArgumentException](LayoutOps.morton2Long(1L << 31, 0L))
    val raised = intercept[Exception] {
      Seq((1L << 31, 0L)).toDF("x", "y")
        .select(LayoutOps.morton2Checked($"x", $"y")).collect()
    }
    assert(raised.getMessage.contains("z-order dimension outside"), raised.getMessage)
  }

  test("box scan is exact, prunes partitions, and prunes on BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("zorder-layout").toString
    val evs = graft.sources.Tables.events(spark, sf)
    LayoutOps.writeZorderLayout(evs, dir)
    val totalBuckets = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("zbucket="))
    assert(totalBuckets > 1, "fixture layout must have something to prune")

    def scan(uLo: Long, uHi: Long, dLo: Long, dHi: Long) =
      LayoutOps.zorderBoxScan(spark, dir, uLo, uHi, dLo, dHi)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id").collect().map(_.getLong(0)).toSet
    def bucketsTouched(uLo: Long, uHi: Long, dLo: Long, dHi: Long) =
      (for { u <- uLo to uHi; d <- dLo to dHi }
        yield LayoutOps.morton2Long(u, d) >> 10).distinct.size

    // exactness vs the raw-table filter
    val brute = evs
      .withColumn("day", expr("ts_sec div 86400"))
      .filter($"user_id".between(3, 9) && $"day".between(19730L, 19739L))
    assert(rowsOf(scan(3, 9, 19730, 19739)) === rowsOf(brute))
    assert(rowsOf(scan(3, 9, 19730, 19739)).nonEmpty)

    // the partition filter is real (pushed to the parquet source)
    val plan = scan(3, 9, 19730, 19739).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("zbucket"), plan)

    // pruning on the 2-D box, and on EACH dimension alone — a user-
    // sorted layout would read everything for the day-only predicate
    // (and vice versa); z-order prunes both, partially
    val (minD, maxD) = (19723L, 19752L)
    val maxU = evs.agg(max($"user_id")).head().getLong(0)
    assert(bucketsTouched(3, 9, 19730, 19739) < totalBuckets)
    assert(bucketsTouched(3, 9, minD, maxD) < totalBuckets,
      "user-only predicate must still prune")
    assert(bucketsTouched(0, maxU, 19730, 19739) < totalBuckets,
      "day-only predicate must still prune")

    // BIG boxes (area > 1e6 cells) auto-route through the z-range
    // decomposition instead of enumerating — same oracle-exact result
    // as the raw-table filter, O(ranges) driver work
    val bigBrute = evs
      .withColumn("day", expr("ts_sec div 86400"))
      .filter($"user_id".between(0, 100000) && $"day".between(19730L, 19739L))
    assert(rowsOf(scan(0, 100000, 19730, 19739)) === rowsOf(bigBrute))
    assert(rowsOf(scan(0, 100000, 19730, 19739)).nonEmpty)
    // the full-domain box is exact too (nothing to prune, everything read)
    assert(rowsOf(scan(0, (1L << 31) - 1, 0, (1L << 31) - 1)) ===
      rowsOf(evs.withColumn("day", expr("ts_sec div 86400"))))
  }

  test("zRangesForBox: exact cell cover, bounded count, disjoint sorted ranges") {
    // brute-force ground truth on a small domain: a cell is covered iff
    // its z falls inside some range; in-box cells MUST be covered
    // (correctness), and the cover's excess is bounded by the budget
    // trade (the residual filter absorbs it)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 25) {
      val uLo = rnd.nextInt(60).toLong; val uHi = uLo + rnd.nextInt(40)
      val dLo = rnd.nextInt(60).toLong; val dHi = dLo + rnd.nextInt(40)
      val ranges = LayoutOps.zRangesForBox(uLo, uHi, dLo, dHi, maxRanges = 64)
      assert(ranges.size <= 68, s"budget blown: ${ranges.size}")
      // sorted, disjoint, non-adjacent (coalesced)
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1)
        case _ =>
      }
      for (u <- uLo to uHi; d <- dLo to dHi) {
        val z = LayoutOps.morton2Long(u, d)
        assert(ranges.exists { case (lo, hi) => z >= lo && z <= hi },
          s"in-box cell ($u,$d) uncovered for box [$uLo,$uHi]x[$dLo,$dHi]")
      }
    }
    // a generous budget covers a small box EXACTLY (no out-of-box cells)
    val exact = LayoutOps.zRangesForBox(4, 7, 4, 7, maxRanges = 64)
    val covered = exact.map { case (lo, hi) => hi - lo + 1 }.sum
    assert(covered === 16L, s"aligned 4x4 box must cover exactly 16 cells, got $covered")
    // the out-of-domain guard holds
    intercept[IllegalArgumentException](
      LayoutOps.zRangesForBox(-1, 5, 0, 5))

    // FULL-DOMAIN-SCALE boxes: budget respected, no overflow, and
    // coverage verified on sampled cells (enumeration is impossible at
    // 2^31 — the regime the decomposition exists for)
    for (_ <- 1 to 10) {
      val uL = math.abs(rnd.nextLong()) % (1L << 30)
      val uH = uL + math.abs(rnd.nextLong()) % ((1L << 31) - uL)
      val dL = math.abs(rnd.nextLong()) % (1L << 30)
      val dH = dL + math.abs(rnd.nextLong()) % ((1L << 31) - dL)
      val ranges = LayoutOps.zRangesForBox(uL, uH, dL, dH, maxRanges = 256)
      assert(ranges.nonEmpty && ranges.size <= 260)
      ranges.foreach { case (lo, hi) => assert(lo >= 0 && hi >= lo) }
      // sampled in-box cells must be covered
      for (_ <- 1 to 50) {
        val u = uL + (math.abs(rnd.nextLong()) % (uH - uL + 1))
        val dd = dL + (math.abs(rnd.nextLong()) % (dH - dL + 1))
        val z = LayoutOps.morton2Long(u, dd)
        assert(ranges.exists { case (lo, hi) => z >= lo && z <= hi },
          s"sampled cell ($u,$dd) uncovered for [$uL,$uH]x[$dL,$dH]")
      }
    }
  }

  test("zone-mapped layout: manifest skipping is exact, balanced, and actually skips") {
    val dir = java.nio.file.Files.createTempDirectory("zonemap-layout").toString
    val evs = graft.sources.Tables.events(spark, sf)
    LayoutOps.writeZoneMappedLayout(evs, dir, nFiles = 16)

    // the manifest: one row per written file, rows conserved, and
    // range-partitioned files are reasonably balanced (sampling-based
    // boundaries, so assert a loose bound, not equality)
    val zm = spark.read.parquet(s"$dir/_zonemap").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(zm.length === 16)
    assert(zm.map(_._6).sum === evs.count())
    assert(zm.map(_._6).max <= 4 * zm.map(_._6).min,
      s"file sizes badly skewed: ${zm.map(_._6).sorted.mkString(",")}")

    def scan(uLo: Long, uHi: Long, dLo: Long, dHi: Long) =
      LayoutOps.zoneMapBoxScan(spark, dir, uLo, uHi, dLo, dHi)
    def filesHit(uLo: Long, uHi: Long, dLo: Long, dHi: Long) =
      zm.count { case (_, ul, uh, dl, dh, _) =>
        !(uh < uLo || ul > uHi || dh < dLo || dl > dHi)
      }
    // exactness vs the raw-table filter
    val brute = evs
      .withColumn("day", expr("ts_sec div 86400"))
      .filter($"user_id".between(10, 16) && $"day".between(19740L, 19749L))
      .select($"event_id").collect().map(_.getLong(0)).toSet
    assert(scan(10, 16, 19740, 19749)
      .select($"event_id").collect().map(_.getLong(0)).toSet === brute)
    assert(brute.nonEmpty)
    // the z-sort is what makes zone maps bite: the box touches a strict
    // subset of files, on the user-only and day-only predicates too
    assert(filesHit(10, 16, 19740, 19749) < 16)
    assert(filesHit(10, 16, Long.MinValue / 4, Long.MaxValue / 4) < 16,
      "user-only predicate must skip files")
    // an out-of-domain box reads NOTHING and still returns the right
    // (empty) frame
    assert(filesHit(9999999, 10000000, 19740, 19749) === 0)
    assert(scan(9999999, 10000000, 19740, 19749).count() === 0L)
  }

  test("event table: crash-atomic appends, head sees the ingest, as-of replays the past") {
    import graft.sources.IndexManifest
    val dir = java.nio.file.Files.createTempDirectory("ztable").toString
    val evs = graft.sources.Tables.events(spark, sf)
      .withColumn("day0", expr("ts_sec div 86400"))
    val cut = 19743L
    LayoutOps.writeEventTable(evs.filter($"day0" <= cut).drop("day0"), dir)
    def ids(asOf: Option[Long]) =
      LayoutOps.eventTableBoxScan(spark, dir, 0, 1000, 19738, 19748, asOf)
        .select($"event_id").collect().map(_.getLong(0)).toSet
    val base = ids(None)
    def brute(maxDay: Long) = evs
      .filter($"user_id".between(0, 1000) && $"day0".between(19738L, 19748L) &&
        $"day0" <= maxDay)
      .select($"event_id").collect().map(_.getLong(0)).toSet
    assert(base === brute(cut) && base.nonEmpty)

    // a CRASHED ingest (files staged, manifest never advanced) is
    // invisible to every reader
    val delta = evs.filter($"day0" > cut).drop("day0")
    // stage-without-commit: write epoch-1 files directly, no advance
    // (the zonemap window's epoch filter is what hides them — the same
    // generic guarantee IndexManifestSpec drills per family)
    delta.limit(5).withColumn("day", expr("ts_sec div 86400"))
      .withColumn("z", LayoutOps.morton2($"user_id", $"day"))
      .write.mode("overwrite").parquet(s"$dir/data/epoch=1")
    assert(ids(None) === base, "staged-but-uncommitted files must be invisible")

    // the real append (its staging overwrites the orphan — idempotent
    // retry), head sees the full history, as-of 0 replays the base
    LayoutOps.appendEventTable(delta, dir)
    assert(ids(None) === brute(99999L))
    assert(ids(None) !== base)
    assert(ids(Some(0L)) === base, "as-of 0 must replay the pre-ingest scan")
    intercept[IllegalArgumentException](ids(Some(2L)))
    // the zone map window grew by exactly the delta's files
    val zmAll = IndexManifest.readAppendOnly(
      spark, dir, "zonemap", IndexManifest.Layout).count()
    val zmBase = IndexManifest.readAppendOnly(
      spark, dir, "zonemap", IndexManifest.Layout, asOf = Some(0L)).count()
    assert(zmAll > zmBase)

    // compaction: scans unchanged, window rebased, fresh DISJOINT
    // z-ranges (each append z-sorts only its own batch — re-clustering
    // is the point), stale epochs vacuumable, still appendable
    val full = ids(None)
    LayoutOps.compactEventTable(spark, dir, nFiles = 8)
    assert(ids(None) === full)
    val st = IndexManifest.committedState(dir, IndexManifest.Layout)
    assert(st.baseEpoch === st.epoch && st.epoch === 2L)
    intercept[IllegalArgumentException](ids(Some(0L)))
    val zm2 = spark.read.parquet(s"$dir/zonemap/epoch=2")
      .collect().map(r => (r.getLong(1), r.getLong(2))) // (u_lo, u_hi) per file
    assert(zm2.length === 8)
    assert(IndexManifest.vacuum(dir, IndexManifest.Layout) >= 2L)
    assert(ids(None) === full)
    LayoutOps.appendEventTable(delta.limit(3), dir)
    assert(IndexManifest.committedState(dir, IndexManifest.Layout).epoch === 3L)
    assert(ids(None).size >= full.size)
  }

  test("event table forget: tombstones hide, time travel composes, compaction is physical") {
    import graft.sources.IndexManifest
    val dir = java.nio.file.Files.createTempDirectory("ztable-forget").toString
    val evs = graft.sources.Tables.events(spark, sf)
    LayoutOps.writeEventTable(evs, dir, nFiles = 4)
    def users(asOf: Option[Long] = None) =
      LayoutOps.readEventTable(spark, dir, asOf)
        .select($"user_id").distinct().as[Long].collect().toSet
    def rows(asOf: Option[Long] = None) =
      LayoutOps.readEventTable(spark, dir, asOf)
        .select($"event_id").as[Long].collect().toSet
    val all = rows()
    val gone = users().filter(_ % 5 == 2)
    assert(gone.nonEmpty)

    LayoutOps.forgetEventTableUsers(gone.toSeq.toDF("user_id"), dir)
    // head readers: the users are gone, everything else survives
    assert(users().intersect(gone).isEmpty)
    val expected = evs.filter(!$"user_id".isin(gone.toSeq: _*))
      .select($"event_id").as[Long].collect().toSet
    assert(rows() === expected)
    // the box scan resolves tombstones too (file-grain path)
    val boxUsers = LayoutOps
      .eventTableBoxScan(spark, dir, 0, 1000000, 19723, 19752)
      .select($"user_id").distinct().as[Long].collect().toSet
    assert(boxUsers.intersect(gone).isEmpty)
    // time travel BELOW the forget epoch still reads the pre-forget
    // table — the documented retention semantics (closure is
    // forget -> compact -> vacuum)
    assert(rows(Some(0L)) === all)

    // compaction: physical removal, dels reset, window rebased —
    // pre-forget epochs (and their data) become unreachable + vacuumable
    LayoutOps.compactEventTable(spark, dir, nFiles = 4)
    assert(rows() === expected)
    intercept[IllegalArgumentException](rows(Some(0L)))
    assert(IndexManifest.vacuum(dir, IndexManifest.Layout) >= 2L)
    assert(rows() === expected)
    // forget-then-re-ingest resolves to present (epoch precedence) —
    // and the re-ingested rows are the ONLY copies (originals are
    // physically gone after the compaction above)
    val u = gone.head
    val uRows = evs.filter($"user_id" === u)
    LayoutOps.appendEventTable(uRows, dir, nFiles = 1)
    assert(rows() === expected ++ uRows.select($"event_id").as[Long].collect())
  }

  /** All FileSourceScanExec leaves, descending through AQE roots and the
    * Spark-4 query-stage wrappers (the PartitionPruningSpec walker).
    */
  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val wrapped = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Seq.empty
    }
    (p match { case s: FileSourceScanExec => Seq(s); case _ => Seq.empty }) ++
      (wrapped ++ p.children).flatMap(fileScans)
  }

  test("stored-table box scan touches ONLY the zone-intersecting files") {
    import graft.sources.IndexManifest
    val dir = LayoutOps.storedEventTable(spark, sf)
    val (uLo, uHi, dLo, dHi) = (0L, 24L, 19738L, 19748L) // the e_table_scan box
    // ground truth from the manifest: the window's full file census and
    // the subset whose [min, max] ranges intersect the box
    val zm = IndexManifest.readAppendOnly(spark, dir, "zonemap", IndexManifest.Layout)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = zm.collect {
      case (f, ul, uh, dl, dh) if !(uh < uLo || ul > uHi || dh < dLo || dl > dHi) => f
    }.toSet
    assert(expected.nonEmpty && expected.size < zm.length,
      s"the fixture box must skip something: ${expected.size} of ${zm.length}")
    // the scan's actual file set — straight from the physical plan's leaves
    val df = LayoutOps.eventTableBoxScan(spark, dir, uLo, uHi, dLo, dHi)
    val allScanned = fileScans(df.queryExecution.executedPlan)
      .flatMap(_.relation.location.inputFiles).toSet
    // the tombstone-resolve leg reads the (tiny) dels component; the
    // DATA files read must be exactly the zone intersection
    val scanned = allScanned.filterNot(_.contains("/dels/"))
    assert(allScanned.size > scanned.size, "the tombstone resolve must be in the plan")
    assert(scanned === expected,
      s"scan read ${scanned.size} data files, zone intersection says ${expected.size}")
    // and the result over the skipped scan is still exact
    val brute = graft.sources.Tables.events(spark, sf)
      .withColumn("day", expr("ts_sec div 86400"))
      .filter($"user_id".between(uLo, uHi) && $"day".between(dLo, dHi))
      .select($"event_id").collect().map(_.getLong(0)).toSet
    assert(df.select($"event_id").collect().map(_.getLong(0)).toSet === brute)
  }

  test("metadata count: full files answer from the manifest, boundary files scan, forget falls back") {
    import graft.sources.IndexManifest
    val dir = java.nio.file.Files.createTempDirectory("ztable-count").toString
    val evs = graft.sources.Tables.events(spark, sf)
    LayoutOps.writeEventTable(evs, dir, nFiles = 16)
    def brute(uLo: Long, uHi: Long, dLo: Long, dHi: Long) = evs
      .withColumn("day", expr("ts_sec div 86400"))
      .filter($"user_id".between(uLo, uHi) && $"day".between(dLo, dHi))
      .count()
    // pick a box wide enough that SOME window file is fully contained
    // (the metadata shortcut must actually be exercised, else the test
    // proves nothing) — the full user range over a day suffix
    val maxU = evs.agg(max($"user_id")).head().getLong(0)
    val (uLo, uHi, dLo, dHi) = (0L, maxU, 19740L, 19752L)
    val zm = IndexManifest.readAppendOnly(spark, dir, "zonemap", IndexManifest.Layout)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nFull = zm.count { case (ul, uh, dl, dh) =>
      ul >= uLo && uh <= uHi && dl >= dLo && dh <= dHi }
    assert(nFull > 0, "fixture box must fully contain at least one file")
    assert(LayoutOps.eventTableBoxCount(spark, dir, uLo, uHi, dLo, dHi) ===
      brute(uLo, uHi, dLo, dHi))
    // a partial-only box and an all-skipped box are exact too
    assert(LayoutOps.eventTableBoxCount(spark, dir, 0, 24, 19738, 19748) ===
      brute(0, 24, 19738, 19748))
    assert(LayoutOps.eventTableBoxCount(spark, dir, 9999999, 10000000, dLo, dHi) === 0L)
    // after a forget the per-file stats are conservative — the count
    // must fall back to the resolved scan and stay exact
    val gone = evs.select($"user_id").distinct().as[Long].collect()
      .filter(_ % 4 == 1)
    LayoutOps.forgetEventTableUsers(gone.toSeq.toDF("user_id"), dir)
    val expect = evs
      .withColumn("day", expr("ts_sec div 86400"))
      .filter($"user_id".between(uLo, uHi) && $"day".between(dLo, dHi) &&
        !$"user_id".isin(gone: _*))
      .count()
    assert(LayoutOps.eventTableBoxCount(spark, dir, uLo, uHi, dLo, dHi) === expect)
  }

  test("metadata count: a tombstone OUTSIDE the counted files' user ranges keeps the pushdown paying") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ztable-count-dels").toString
    // 400 in-box rows (users 0-39, 10 rows each, days 19740-19744) plus
    // one far outlier user whose rows land in the top z-range file
    val inBox = spark.range(0, 400).select(
      $"id".as("event_id"), ($"id" % 40).as("user_id"),
      (lit(19740L * 86400L) + ($"id" % 5) * 86400L).as("ts_sec"))
    val outlier = Seq((9000L, 90L, 19740L * 86400L))
      .toDF("event_id", "user_id", "ts_sec")
    LayoutOps.writeEventTable(inBox.union(outlier), dir, nFiles = 8)
    val (uLo, uHi, dLo, dHi) = (0L, 60L, 19739L, 19746L) // excludes user 90
    val before = LayoutOps.eventTableBoxCountDetail(spark, dir, uLo, uHi, dLo, dHi)
    assert(before._3 > 0, "fixture must exercise the metadata path")
    assert(before._1 + before._2 === 400L)

    // forget the outlier: its user range intersects NO counted file,
    // so every previously metadata-counted file stays metadata-counted
    LayoutOps.forgetEventTableUsers(Seq(90L).toDF("user_id"), dir)
    val after = LayoutOps.eventTableBoxCountDetail(spark, dir, uLo, uHi, dLo, dHi)
    assert(after._3 === before._3,
      "a tombstone outside the box must not demote metadata-counted files")
    assert(after._1 + after._2 === 400L)

    // forget an IN-BOX user: only the files whose range contains it
    // demote to the scanned-and-resolved leg; the count stays exact
    LayoutOps.forgetEventTableUsers(Seq(7L).toDF("user_id"), dir)
    val d3 = LayoutOps.eventTableBoxCountDetail(spark, dir, uLo, uHi, dLo, dHi)
    assert(d3._1 + d3._2 === 390L, "user 7's 10 rows must leave the count")
    assert(d3._3 < before._3, "the touched files must leave the metadata leg")

    // dels past the driver-probe cap: the guard demotes EVERY
    // overlapping file to the scanned leg instead of collecting an
    // unbounded id set — the count stays exact, just slower (the
    // deletion-vector assumption enforced, not assumed)
    val capped = LayoutOps.eventTableBoxCountDetail(spark, dir, uLo, uHi, dLo, dHi,
      delsCap = 0L)
    assert(capped._3 === 0L, "past the cap no file may stay on the metadata leg")
    assert(capped._1 === 0L && capped._2 === 390L,
      "the full-scan fallback must still count exactly")
  }

  test("catalog rows served from the stored table equal their raw-scan twins") {
    def rows(q: Q) = q.spark(spark, sf).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(rows(LayoutOps.hotItemsFromTable) === rows(EventAnalytics.hotItemsTopN))
    assert(rows(LayoutOps.sessionizeFromTable) === rows(EventAnalytics.sessionize))
    assert(rows(LayoutOps.funnelFromTable) === rows(EventAnalytics.funnelRelaxed))
  }
}
