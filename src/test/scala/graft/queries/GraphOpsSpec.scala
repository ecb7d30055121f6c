package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GraphOps — hand-computed PageRank pin on a tiny graph, edge-extraction
  * semantics, and planted cohort/rolling/co-occurrence fixtures.
  */
class GraphOpsSpec extends SparkSpec {

  import spark.implicits._

  test("pageRankOn reproduces hand-computed fixed-point ranks on a 3-cycle with a dangler") {
    // Graph: 1 -> 2 (w=1), 2 -> 3 (w=1), 3 -> 1 (w=1), and dangling node 4
    // (in-edge 1 -> 4 w=1 so node 1 splits its mass; 4 has no out-edges).
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("item")
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L), (1L, 4L, 1L))
      .toDF("src", "dst", "w")

    // Hand iteration of rank' = 150000 + Σ ((rank*85 div 100)*w) div out_w:
    def step(r: Map[Long, Long]): Map[Long, Long] = {
      def share(u: Long): Long = r(u) * 85 / 100
      Map(
        1L -> (150000L + share(3L)),          // from 3 (out_w=1)
        2L -> (150000L + share(1L) / 2),      // from 1 (out_w=2)
        3L -> (150000L + share(2L)),          // from 2 (out_w=1)
        4L -> (150000L + share(1L) / 2),
      )
    }
    var expect = Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L, 4L -> 1000000L)
    for (_ <- 1 to 3) expect = step(expect)

    val got = GraphOps.pageRankOn(nodes, edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    // the cycle members outrank the dangler (it only receives half of 1's mass)
    assert(got(3L) > got(4L))
  }

  test("pageRank is partitioning-invariant: shuffled input yields bit-identical ranks") {
    val nodes = (1L to 40L).toDF("item")
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)((rnd.nextInt(40) + 1L, rnd.nextInt(40) + 1L))
      .filter(e => e._1 != e._2)
      .groupBy(identity).map { case (e, g) => (e._1, e._2, g.size.toLong) }.toSeq
    val a = GraphOps.pageRankOn(nodes, edges.toDF("src", "dst", "w"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphOps.pageRankOn(
      nodes.repartition(7),
      scala.util.Random.shuffle(edges).toDF("src", "dst", "w").repartition(5), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b) // integer fixed-point sums are order-independent
  }

  test("seeded pagerank: exactly 3 seeds; teleport mass only at seeds") {
    val rows = Catalog.queries("e_ppr_seeded")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.count(_._2 == 1L) === 3)
    // non-seeds receive only propagated mass — every non-seed's rank is
    // strictly below the standalone teleport floor seeds always keep
    val minSeed = rows.filter(_._2 == 1L).map(_._3).min
    assert(minSeed >= 150000L)
    assert(rows.nonEmpty)
  }

  test("stored graph: pageRankFromGraph equals the inline e_pagerank ranks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-graph").toString
    val evs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("item", regexp_extract($"props", "(\\d+)", 1).cast("long"))
    GraphOps.writeTransitionGraph(evs, dir)
    val stored = GraphOps.pageRankFromGraph(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inline = Catalog.queries("e_pagerank")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored === inline)
  }

  test("appendTransitionGraph with the carry convention equals a full-log rebuild") {
    val evs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("item", regexp_extract($"props", "(\\d+)", 1).cast("long"))
    // split the log at its median day; carry = each user's latest early event
    val split = evs.agg(expr("percentile_approx(ts_sec, 0.5)")).head().getLong(0)
    val early = evs.filter($"ts_sec" < split)
    val late = evs.filter($"ts_sec" >= split)
    val wLast = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_sec".desc, $"event_id".desc)
    val carry = early.withColumn("rk", row_number().over(wLast)).filter($"rk" === 1).drop("rk")
    val appended = java.nio.file.Files.createTempDirectory("graph-app").toString
    GraphOps.writeTransitionGraph(early, appended)
    GraphOps.appendTransitionGraph(carry.unionByName(late), appended)
    val rebuilt = java.nio.file.Files.createTempDirectory("graph-reb").toString
    GraphOps.writeTransitionGraph(evs, rebuilt)
    def edges(dir: String) = graft.sources.IndexManifest.readRewrite(spark, dir, "edges")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // append keeps zero-weight rows only if a merge produced them; filter both
    assert(edges(appended).filter(_._2 > 0) === edges(rebuilt).filter(_._2 > 0),
      "boundary-carried append must reproduce the full-log edge weights")
    def nodes(dir: String) = graft.sources.IndexManifest.readRewrite(spark, dir, "nodes")
      .collect().map(_.getLong(0)).toSet
    assert(nodes(appended) === nodes(rebuilt))
    def ranks(dir: String) = GraphOps.pageRankFromGraph(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(appended) === ranks(rebuilt))
    // second slice boundary: re-split the late half and append in two
    // carried steps — still equal to the one-shot rebuild (associative)
    val split2 = late.agg(expr("percentile_approx(ts_sec, 0.5)")).head().getLong(0)
    val mid = late.filter($"ts_sec" < split2)
    val tail = late.filter($"ts_sec" >= split2)
    val carryMid = early.unionByName(mid)
      .withColumn("rk", row_number().over(wLast)).filter($"rk" === 1).drop("rk")
    val appended2 = java.nio.file.Files.createTempDirectory("graph-app2").toString
    GraphOps.writeTransitionGraph(early, appended2)
    GraphOps.appendTransitionGraph(carry.unionByName(mid), appended2)
    GraphOps.appendTransitionGraph(carryMid.unionByName(tail), appended2)
    assert(edges(appended2).filter(_._2 > 0) === edges(rebuilt).filter(_._2 > 0))
    assert(ranks(appended2) === ranks(rebuilt))
  }

  test("transition forget: edges equal rebuild minus the users; nodes are catalog") {
    val evs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("item", regexp_extract($"props", "(\\d+)", 1).cast("long"))
      // plant a sole-toucher: user -1 walks two items nobody else has
      .unionByName(Seq(
        (-1L, 900001L, 1L, 1L), (-1L, 900002L, 2L, 2L)
      ).toDF("user_id", "item", "ts_sec", "event_id")
        .select($"user_id", $"ts_sec", $"event_id", $"item"), allowMissingColumns = true)
      .select($"user_id", $"ts_sec", $"event_id", $"item")
    def edges(dir: String) = graft.sources.IndexManifest.readRewrite(spark, dir, "edges")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def nodes(dir: String) = graft.sources.IndexManifest.readRewrite(spark, dir, "nodes")
      .collect().map(_.getLong(0)).toSet
    def ranks(dir: String) = GraphOps.pageRankFromGraph(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val gone = evs.filter($"user_id" % 5 === 0 || $"user_id" === -1L)
    val dir = java.nio.file.Files.createTempDirectory("graph-forget").toString
    GraphOps.writeTransitionGraph(evs, dir)
    GraphOps.forgetTransitionUsers(gone, dir)
    val reb = java.nio.file.Files.createTempDirectory("graph-forget-reb").toString
    GraphOps.writeTransitionGraph(
      evs.filter(!($"user_id" % 5 === 0 || $"user_id" === -1L)), reb)

    // edge weights: exactly the rebuild's (zero-weight edges erased)
    assert(edges(dir) === edges(reb),
      "forget must subtract exactly the users' transition weights")
    // nodes: the full item catalog survives (documented semantics) —
    // a strict superset containing the rebuild's nodes plus the
    // sole-toucher's items
    assert(nodes(reb).subsetOf(nodes(dir)))
    assert(nodes(dir).contains(900001L) && nodes(dir).contains(900002L))
    // ranks: bit-identical on the rebuild's nodes; extra isolated nodes
    // sit at the base teleport mass and influence nothing
    val r = ranks(dir); val rr = ranks(reb)
    rr.foreach { case (item, rank) => assert(r(item) === rank, s"rank drift at $item") }
    (r.keySet -- rr.keySet).foreach { item =>
      assert(r(item) === 150000L, s"isolated node $item must hold base rank") }

    // killed forget is invisible; retry lands clean
    val dir2 = java.nio.file.Files.createTempDirectory("graph-forget-kill").toString
    GraphOps.writeTransitionGraph(evs, dir2)
    val pre = edges(dir2)
    GraphOps.stageTransitionForget(gone, dir2, 1L)
    assert(graft.sources.IndexManifest.committedEpoch(
      dir2, graft.sources.IndexManifest.Transition) === 0L)
    assert(edges(dir2) === pre, "uncommitted forget leaked")
    GraphOps.forgetTransitionUsers(gone, dir2)
    assert(edges(dir2) === edges(reb))
  }

  test("incremental agg equals recompute; empty-input safe") {
    val sf = "/root/testdata/sf0.001"
    val got = Catalog.queries("t_incr_agg")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val recompute = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type", expr("ts_sec div 86400").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === recompute)
  }

  test("transitionEdges orders by time within user, drops self-loops, counts repeats") {
    val evs = Seq(
      // user 1: a -> b -> b -> a  (self-loop b->b dropped)
      (1L, 10L, 100L, 7L), (2L, 20L, 100L, 8L), (3L, 30L, 100L, 8L), (4L, 40L, 100L, 7L),
      // user 2: a -> b again (cross-user edges never form)
      (5L, 10L, 200L, 7L), (6L, 20L, 200L, 8L),
    ).toDF("event_id", "ts_sec", "user_id", "item")
    val got = GraphOps.transitionEdges(evs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((7L, 8L) -> 2L, (8L, 7L) -> 1L))
  }

  test("catalog cohort retention: offset-0 row equals cohort size; counts never exceed it") {
    val df = Catalog.queries("e_cohort_retention")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cohortSizes = df.collect { case ((c, 0L), n) => c -> n }
    assert(cohortSizes.nonEmpty)
    df.foreach { case ((c, off), n) =>
      assert(off >= 0L)
      assert(n <= cohortSizes(c), s"cohort $c offset $off exceeds cohort size")
    }
  }

  test("catalog rolling active: wau7 >= dau, and wau7 equals brute-force 7-day distinct") {
    val rows = Catalog.queries("e_rolling_active")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val ud = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", expr("ts_sec div 86400").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { case (day, dau, wau) =>
      assert(wau >= dau)
      val brute = ud.filter { case (_, d) => d >= day - 6 && d <= day }.map(_._1).distinct.length
      assert(wau === brute.toLong, s"day $day")
    }
  }

  test("markov next: ppm probabilities per src sum to <= 1e6 and rank by weight") {
    val rows = Catalog.queries("e_markov_next")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length <= 3)
      // floors only lose mass; a top-3 slice can never exceed the full ppm
      assert(g.map(_._5).sum <= 1000000L)
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    }
  }

  test("path top-n equals brute-force 3-step path counting") {
    val evs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("item", regexp_extract($"props", "(\\d+)", 1).cast("long"))
      .filter($"item".isNotNull)
      .select($"user_id", $"ts_sec", $"event_id", $"item")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val paths = evs.groupBy(_._1).values.flatMap { g =>
      g.sortBy(e => (e._2, e._3)).map(_._4).sliding(3).filter(_.length == 3)
        .map(p => (p(0), p(1), p(2)))
    }.toSeq.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = paths.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
      .map { case ((a, b, c), n) => (a, b, c, n) }
    val got = Catalog.queries("e_path_topn")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect)
  }

  test("anomaly days: med/mad are exact lower medians; flag matches the rule") {
    val rows = Catalog.queries("e_anomaly_days")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
      val med = lowerMedian(g.map(_._3).toSeq)
      assert(g.forall(_._4 == med))
      val mad = lowerMedian(g.map(r => math.abs(r._3 - med)).toSeq)
      assert(g.forall(_._6 == mad))
      g.foreach { case (_, _, n, m, dev, md, flag) =>
        assert(dev === math.abs(n - m))
        assert(flag === (dev > 3 * md))
      }
    }
    // the truncated final day is a genuine planted-by-reality outlier
    assert(rows.exists(_._7), "expected at least one outlier day")
  }

  test("clustering: triangle counts equal brute-force enumeration on sf0.001") {
    val edges = GraphOps.transitionEdges(
      graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .withColumn("item", regexp_extract($"props", "(\\d+)", 1).cast("long"))
        .filter($"item".isNotNull)
        .select($"user_id", $"ts_sec", $"event_id", $"item"))
      .collect().map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      .withDefaultValue(Set.empty[Long])
    def neighbors(n: Long): Set[Long] =
      edges.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj(b) if adj(a).contains(c)) {
      triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1
    }
    val got = Catalog.queries("e_clustering")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (node, deg, nTri, ccPpm) =>
      assert(deg === neighbors(node).size.toLong)
      assert(nTri === triPerNode(node))
      val expectCc = if (deg >= 2) 2 * nTri * 1000000L / (deg * (deg - 1)) else 0L
      assert(ccPpm === expectCc)
    }
  }

  test("attribution conserves purchases and revenue; credits match brute-force last views") {
    val sf = "/root/testdata/sf0.001"
    val rows = Catalog.queries("e_attribution")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val evs = graft.sources.Tables.events(spark, sf)
      .withColumn("item", regexp_extract($"props", "(\\d+)", 1).cast("long"))
      .select($"event_id", $"user_id", $"event_type", $"ts_sec", $"item",
        floor($"value" * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val purchases = evs.filter(_._3 == "purchase")
    // conservation: every purchase lands in exactly one bucket
    assert(rows.map(_._2).sum === purchases.length.toLong)
    assert(rows.map(_._3).sum === purchases.map(_._6).sum)
    // brute-force credit: most recent view at-or-before, (sec, event_id) order
    val byUser = evs.filter(_._3 == "view").groupBy(_._2)
    val expect = scala.collection.mutable.Map.empty[Long, (Long, Long)].withDefaultValue((0L, 0L))
    purchases.foreach { case (pid, uid, _, psec, _, cents) =>
      // at-or-before on sec: views at the purchase's own second count
      // (oracle orders by sec, side, event_id with views first)
      val last = byUser.getOrElse(uid, Array.empty)
        .filter(v => v._4 <= psec)
        .sortBy(v => (v._4, v._1)).lastOption
      val item = last.map(_._5).getOrElse(-1L)
      val (n, c) = expect(item); expect(item) = (n + 1, c + cents)
    }
    assert(rows.map(r => r._1 -> (r._2, r._3)).toMap === expect.toMap)
  }

  test("funnel rates: monotone stages; stage 3 equals the verified funnel's user count") {
    val sf = "/root/testdata/sf0.001"
    val r = Catalog.queries("e_funnel_rates")(spark, sf).collect().head
    val (nView, nClick, nFunnel) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nView >= nClick && nClick >= nFunnel && nFunnel > 0)
    assert(r.getLong(3) === nClick * 1000000L / nView)
    assert(r.getLong(4) === nFunnel * 1000000L / nClick)
    val funnelUsers = Catalog.queries("e_funnel_relaxed")(spark, sf).count()
    assert(nFunnel === funnelUsers)
  }

  test("linear attribution conserves revenue to the cent") {
    val sf = "/root/testdata/sf0.001"
    val rows = Catalog.queries("e_attribution_linear")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totalCents = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select(floor($"value" * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).sum
    // every purchase's cents land somewhere (splits + remainders + -1 bucket)
    assert(rows.map(_._3).sum === totalCents)
    assert(rows.exists(_._1 == -1L) || rows.nonEmpty)
  }

  test("catalog item co-occurrence: support equals brute-force user-set intersection") {
    val rows = Catalog.queries("e_item_cooccur")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 20)
    val ui = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("item", regexp_extract($"props", "(\\d+)", 1).cast("long"))
      .filter($"item".isNotNull)
      .select($"user_id", $"item").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byItem = ui.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    rows.foreach { case (i1, i2, n) =>
      assert(i1 < i2)
      assert(n === (byItem(i1) & byItem(i2)).size.toLong)
    }
    // descending support, deterministic tiebreak
    assert(rows.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("e_communities equals brute-force union-find over the thresholded co-occur graph") {
    val sf = "/root/testdata/sf0.001"
    // independently rebuild the (user, item) pairs the operator derives
    val ui = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id",
        "TRY_CAST(regexp_extract(props, '(\\\\d+)', 1) AS BIGINT) AS item")
      .where("item IS NOT NULL")
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = ui.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val support = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byUser.values.foreach { items =>
      for (i <- items.indices; j <- i + 1 until items.length)
        support((items(i), items(j))) = support.getOrElse((items(i), items(j)), 0L) + 1L
    }
    val items = ui.map(_._2).distinct
    val parent = scala.collection.mutable.Map(items.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    // NB: .collect on the Map with a tuple result would rebuild a Map and
    // silently collapse edges sharing a source — iterate explicitly
    support.iterator.foreach { case ((a, b), n) =>
      if (n >= 2L) {
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val expectComm = items.map(i => i -> find(i)).toMap
    val expectSizes = expectComm.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Catalog.queries("e_communities")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("item") ->
        ((r.getAs[Long]("community"), r.getAs[Long]("community_size"), r.getAs[Boolean]("converged"))))
      .toMap
    assert(got.keySet === items.toSet)
    got.foreach { case (item, (comm, size, conv)) =>
      assert(comm === expectComm(item), s"item $item community")
      assert(size === expectSizes(expectComm(item)), s"item $item community size")
      assert(conv)
    }
    // the fixture graph must be non-trivial in both directions
    assert(expectSizes.values.exists(_ > 1L), "at least one multi-item community")
  }

  test("degree cap: a planted bot user is dropped from pairing; organic pairs unchanged") {
    // 3 organic users over 4 items + one bot touching maxUserDegree+50
    // distinct items (including the organic ones, so uncapped pairing
    // would BOTH inflate organic supports and bridge everything).
    val organic = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 11L), (3L, 12L), (3L, 13L))
    val bot = (0 until (GraphOps.maxUserDegree + 50L).toInt)
      .map(i => (99L, 10L + i.toLong))
    val ui = (organic ++ bot).toDF("user_id", "item")

    val capped = GraphOps.cappedUi(ui).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSet === organic.toSet, "bot rows removed, organic rows intact")

    val pairs = GraphOps.pairSupport(GraphOps.cappedUi(ui))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // brute-force supports over the ORGANIC users only
    val expect = organic.groupBy(_._1).values.flatMap { rows =>
      val items = rows.map(_._2).sorted
      for (i <- items.indices; j <- i + 1 until items.length) yield (items(i), items(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(pairs === expect)
    // uncapped pairing would have produced bot-bridged pairs like (12, 13+k)
    assert(!pairs.contains((12L, 14L)), "no bot-only pair survives")

    // a user AT the cap is kept (cap is inclusive)
    val atCap = (0 until GraphOps.maxUserDegree.toInt).map(i => (7L, 100L + i.toLong))
    assert(GraphOps.cappedUi(atCap.toDF("user_id", "item")).count()
      === GraphOps.maxUserDegree)

    // the audit surfaces exactly the one capped user and the work avoided
    val cap = GraphOps.maxUserDegree
    val botDeg = cap + 50L
    val a = GraphOps.degreeCapAuditOn(ui).collect().head
    assert(a.getAs[Long]("n_users") === 4L)
    assert(a.getAs[Long]("n_capped_users") === 1L)
    assert(a.getAs[Long]("avoided_pairs") === botDeg * (botDeg - 1L) / 2L)
    assert(a.getAs[Long]("max_degree") === botDeg)
    // and on the organic catalog the cap removes nobody (the contract
    // that keeps all three pair-join oracles bit-identical at test SFs)
    val cat = Catalog.queries("e_degree_cap_audit")(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(cat.getAs[Long]("n_capped_users") === 0L)
    assert(cat.getAs[Long]("max_degree") <= cap)
  }
}
