package graft.queries

import graft.SparkSpec

/** SCD2 dimension-history build — planted histories exercising every
  * version-boundary rule (content change, presence gap, revert, late
  * add, single-day life) plus brute-force parity on the fixture corpus.
  */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("scd2On: planted histories hit every boundary rule") {
    // (doc_id, day, hash)
    val snaps = Seq(
      // doc 1: unchanged across all days -> one current row 0..2
      (1L, 0L, "a"), (1L, 1L, "a"), (1L, 2L, "a"),
      // doc 2: changed at day 2 -> two versions, second current
      (2L, 0L, "a"), (2L, 1L, "a"), (2L, 2L, "b"),
      // doc 3: removed after day 0 -> one closed row, not current
      (3L, 0L, "a"),
      // doc 4: added at day 2 -> one current row 2..2
      (4L, 2L, "a"),
      // doc 5: present day 0 and 2, SAME hash but a presence gap ->
      // two versions (the SCD2 re-add convention), second current
      (5L, 0L, "a"), (5L, 2L, "a"),
      // doc 6: a -> b -> a revert: three versions even though the
      // content hash repeats
      (6L, 0L, "a"), (6L, 1L, "b"), (6L, 2L, "a"),
    ).toDF("doc_id", "d", "h")
    val got = TextOps.scd2On(snaps, lastDay = 2L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("version")) ->
        ((r.getAs[String]("content_hash"), r.getAs[Long]("valid_from"),
          r.getAs[Long]("valid_to"), r.getAs[Boolean]("is_current"))))
      .toMap
    assert(got((1L, 1L)) === (("a", 0L, 2L, true)))
    assert(got((2L, 1L)) === (("a", 0L, 1L, false)))
    assert(got((2L, 2L)) === (("b", 2L, 2L, true)))
    assert(got((3L, 1L)) === (("a", 0L, 0L, false)))
    assert(got((4L, 1L)) === (("a", 2L, 2L, true)))
    assert(got((5L, 1L)) === (("a", 0L, 0L, false)))
    assert(got((5L, 2L)) === (("a", 2L, 2L, true)))
    assert(got((6L, 1L)) === (("a", 0L, 0L, false)))
    assert(got((6L, 2L)) === (("b", 1L, 1L, false)))
    assert(got((6L, 3L)) === (("a", 2L, 2L, true)))
    assert(got.size === 10)
  }

  test("t_scd2_history equals a brute-force per-doc run-length scan") {
    // independently rebuild the three snapshots and the expected runs
    val base = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // the synthetic-add offset is max(doc_id)+1 (collision-proof at any
    // corpus size), mirrored from the operator
    val off = base.map(_._1).max + 1L
    val day0 = base.toMap
    val day1 = (base.filter(_._1 % 10 != 0).map { case (id, t) =>
      id -> (if (id % 7 == 0) t + " rev2" else t)
    } ++ base.filter(_._1 % 13 == 0).map { case (id, t) => (id + off) -> t }).toMap
    val day2 = (day1.toSeq.filter(_._1 % 11 != 0).map { case (id, t) =>
      id -> (if (id % 5 == 0) t + " rev3" else t)
    } ++ day1.toSeq.filter(_._1 % 17 == 0).map { case (id, t) => (id + 2L * off) -> t }).toMap
    val days = Seq(day0, day1, day2)
    val allIds = days.flatMap(_.keySet).distinct
    val expect = allIds.flatMap { id =>
      val presence = (0 to 2).flatMap(d => days(d).get(id).map(t => (d.toLong, md5hex(t))))
      // split into runs: new run on gap or hash change
      val runs = presence.foldLeft(Vector.empty[Vector[(Long, String)]]) {
        case (acc, (d, h)) =>
          if (acc.nonEmpty && acc.last.last._2 == h && acc.last.last._1 == d - 1)
            acc.init :+ (acc.last :+ ((d, h)))
          else acc :+ Vector((d, h))
      }
      runs.zipWithIndex.map { case (run, i) =>
        (id, (i + 1).toLong) ->
          ((run.head._2, run.head._1, run.last._1, run.last._1 == 2L))
      }
    }.toMap
    val got = Catalog.queries("t_scd2_history")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("version")) ->
        ((r.getAs[String]("content_hash"), r.getAs[Long]("valid_from"),
          r.getAs[Long]("valid_to"), r.getAs[Boolean]("is_current"))))
      .toMap
    assert(got === expect)
    // the fixture must actually exercise all four lifecycle shapes
    val shapes = got.values.toSeq
    assert(shapes.exists(v => v._2 == 0L && v._3 == 2L && v._4), "survivor")
    assert(shapes.exists(v => !v._4), "closed version")
    assert(shapes.exists(v => v._2 > 0L), "late add")
    assert(got.keySet.exists(_._2 >= 2L), "multi-version doc")
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def histSet(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("version"),
        r.getAs[String]("content_hash"), r.getAs[Long]("valid_from"),
        r.getAs[Long]("valid_to"), r.getAs[Boolean]("is_current")))
      .toSet

  test("stored SCD2 fold: write + append + append equals the full scd2On rebuild") {
    val days = TextOps.scd2SnapshotDays(spark, sf)
    val dir = tmp("scd2-store")
    TextOps.writeScd2(days(0), 0L, dir)
    TextOps.appendScd2Snapshot(days(1), 1L, dir)
    TextOps.appendScd2Snapshot(days(2), 2L, dir)
    val got = histSet(TextOps.readScd2(spark, dir))
    val rebuild = histSet(Catalog.queries("t_scd2_history")(spark, sf))
    assert(got === rebuild,
      "incremental fold must reproduce the full-history rebuild exactly")
    // the fold's plan never touches closed history: only latest + snapshot
    assert(rebuild.nonEmpty)
  }

  test("stored SCD2 fold: planted gap / revert / reappear histories match scd2On") {
    // same lifecycle matrix as the scd2On planted test, as (doc_id, text)
    // snapshots folded through the stored table
    val day0 = Seq((1L, "a"), (2L, "a"), (3L, "a"), (5L, "a"), (6L, "a"))
    val day1 = Seq((1L, "a"), (2L, "a"), (6L, "b"))
    val day2 = Seq((1L, "a"), (2L, "b"), (4L, "a"), (5L, "a"), (6L, "a"))
    val dir = tmp("scd2-planted")
    TextOps.writeScd2(day0.toDF("doc_id", "text"), 0L, dir)
    TextOps.appendScd2Snapshot(day1.toDF("doc_id", "text"), 1L, dir)
    TextOps.appendScd2Snapshot(day2.toDF("doc_id", "text"), 2L, dir)
    val snaps = Seq((day0, 0L), (day1, 1L), (day2, 2L)).flatMap { case (d, i) =>
      d.map { case (id, t) => (id, i, t) }
    }.toDF("doc_id", "d", "text")
      .select($"doc_id", $"d", org.apache.spark.sql.functions.md5($"text").as("h"))
    assert(histSet(TextOps.readScd2(spark, dir))
      === histSet(TextOps.scd2On(snaps, lastDay = 2L)))
    // sanity on the hard rules through the STORED path
    val byKey = TextOps.readScd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("version")) ->
        ((r.getAs[Long]("valid_from"), r.getAs[Long]("valid_to"),
          r.getAs[Boolean]("is_current")))).toMap
    assert(byKey((5L, 2L)) === ((2L, 2L, true)), "gap reappear = new version")
    assert(byKey((6L, 3L)) === ((2L, 2L, true)), "revert = third version")
    assert(byKey((3L, 1L)) === ((0L, 0L, false)), "removed doc stays closed")
  }

  test("scd2AsOf round-trips every snapshot day, including across a presence gap") {
    val day0 = Seq((1L, "a"), (2L, "a"), (3L, "a"), (5L, "a"), (6L, "a"))
    val day1 = Seq((1L, "a"), (2L, "a"), (6L, "b"))
    val day2 = Seq((1L, "a"), (2L, "b"), (4L, "a"), (5L, "a"), (6L, "a"))
    val dir = tmp("scd2-asof")
    TextOps.writeScd2(day0.toDF("doc_id", "text"), 0L, dir)
    TextOps.appendScd2Snapshot(day1.toDF("doc_id", "text"), 1L, dir)
    TextOps.appendScd2Snapshot(day2.toDF("doc_id", "text"), 2L, dir)
    val hist = TextOps.readScd2(spark, dir)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Seq((day0, 0L), (day1, 1L), (day2, 2L)).foreach { case (snap, d) =>
      val got = TextOps.scd2AsOf(hist, d)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
      val expect = snap.map { case (id, t) => id -> md5hex(t) }.toSet
      assert(got === expect, s"as-of day $d must equal that day's snapshot")
    }
    // doc 5 is ABSENT on day 1 (the gap day): no version window covers it
    assert(!TextOps.scd2AsOf(hist, 1L).collect().map(_.getLong(0)).contains(5L))
  }

  test("property: random presence/content histories — day-by-day fold equals scd2On") {
    // 40 docs x 5 days, each (doc, day) independently present with a
    // random 3-letter payload: exercises every boundary interleaving
    // (multi-gap, revert-across-gap, last-day birth, first-day death)
    // far beyond the planted matrix. Seeded: failures reproduce.
    val rnd = new scala.util.Random(20260814)
    val days = 5
    val hist: Seq[(Long, Long, String)] = for {
      doc <- 1L to 40L
      day <- 0L until days.toLong
      if rnd.nextDouble() < 0.6
    } yield (doc, day, ("abc" (rnd.nextInt(3))).toString * 3)
    // day-by-day incremental fold through the stored table. writeScd2
    // seeds day 0; a doc ABSENT on day 0 simply first appears at its
    // first present day — the fold's new-doc branch.
    val byDay = (0L until days.toLong)
      .map(d => d -> hist.filter(_._2 == d).map(t => (t._1, t._3)))
    val dir = tmp("scd2-prop")
    TextOps.writeScd2(byDay.head._2.toDF("doc_id", "text"), 0L, dir)
    byDay.tail.foreach { case (d, snap) =>
      TextOps.appendScd2Snapshot(snap.toDF("doc_id", "text"), d, dir)
    }
    val snaps = hist.toDF("doc_id", "d", "text")
      .select($"doc_id", $"d", org.apache.spark.sql.functions.md5($"text").as("h"))
    val expect = histSet(TextOps.scd2On(snaps, lastDay = days - 1L))
    assert(histSet(TextOps.readScd2(spark, dir)) === expect)
    // the random history must actually contain the hard shapes
    val versionsPerDoc = expect.groupBy(_._1).view.mapValues(_.size)
    assert(versionsPerDoc.values.exists(_ >= 3), "multi-version docs generated")
    assert(expect.exists(v => v._4 == v._5 && !v._6), "closed single-day versions generated")
  }

  test("killed SCD2 fold is invisible; retry equals the rebuild") {
    val days = TextOps.scd2SnapshotDays(spark, sf)
    val dir = tmp("scd2-kill")
    TextOps.writeScd2(days(0), 0L, dir)
    TextOps.appendScd2Snapshot(days(1), 1L, dir)
    val before = histSet(TextOps.readScd2(spark, dir))
    // crash: stage day 2 without committing
    TextOps.stageScd2Append(days(2), 2L, dir, 2L)
    assert(graft.sources.IndexManifest.committedEpoch(dir) === 1L)
    assert(histSet(TextOps.readScd2(spark, dir)) === before,
      "uncommitted fold leaked into reads")
    // retry the full fold: overwrites the orphan stage, then commits
    TextOps.appendScd2Snapshot(days(2), 2L, dir)
    assert(histSet(TextOps.readScd2(spark, dir))
      === histSet(Catalog.queries("t_scd2_history")(spark, sf)))
  }
}
