package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired A/B for the round-21 iteration-overhead fixes (alternating
  * reps in ONE session — the ProfServe/ProfMMPersist discipline):
  *
  *  A. connectedComponentsStats: eager checkpoint + separate label-sum
  *     probe (2 jobs/round, the pre-r21 shape, inlined below) vs the
  *     live lazy-checkpoint form (1 job/round — the sum materializes
  *     the round).
  *  B. pageRankOn: per-iteration nodes rescan (pre-r21, inlined) vs
  *     the live checkpointed-nodes form.
  *
  * Run: sbt "Test/runMain graft.queries.ProfIterAB"
  */
object ProfIterAB {
  // ---- pre-r21 CC (eager checkpoints, 2 jobs/round) ----
  private def ccOld(edges: DataFrame): DataFrame = {
    val persist: DataFrame => DataFrame = df => df.localCheckpoint(true)
    val und = persist(
      edges.select(col("doc_a").as("v"), col("doc_b").as("nbr"))
        .union(edges.select(col("doc_b").as("v"), col("doc_a").as("nbr"))))
    var labels = persist(und.select(col("v")).distinct().withColumn("lbl", col("v")))
    def lblSum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("lbl").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var prevSum = lblSum(labels)
    var round = 0
    var changed = true
    while (changed && round < 50) {
      val nbrLbl = und
        .join(labels.select(col("v").as("nbr"), col("lbl")), "nbr")
        .select(col("v"), col("lbl"))
      val hopped = labels.select(col("v"), col("lbl"))
        .union(nbrLbl)
        .groupBy(col("v")).agg(min(col("lbl")).as("lbl"))
      val next = persist(
        hopped
          .join(
            hopped.select(col("v").as("l2"), col("lbl").as("lbl2")),
            col("lbl") === col("l2"), "left")
          .select(col("v"), least(col("lbl"), coalesce(col("lbl2"), col("lbl"))).as("lbl")))
      val nextSum = lblSum(next)
      changed = nextSum.compareTo(prevSum) != 0
      prevSum = nextSum
      labels = next
      round += 1
    }
    labels
  }

  // ---- candidate: double shortcut per round (same fixpoint, fewer rounds) ----
  private def ccDouble(edges: DataFrame): DataFrame = {
    val persist: DataFrame => DataFrame = df => df.localCheckpoint(false)
    // und pre-partitioned by the per-round join key: the checkpointed
    // RDD keeps its hash partitioning, so the hop join re-shuffles only
    // the labels side each round
    val und = persist(
      edges.select(col("doc_a").as("v"), col("doc_b").as("nbr"))
        .union(edges.select(col("doc_b").as("v"), col("doc_a").as("nbr")))
        .repartition(col("nbr")))
    var labels = persist(und.select(col("v")).distinct().withColumn("lbl", col("v")))
    def lblSum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("lbl").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    def shortcut(df: DataFrame): DataFrame =
      df.join(df.select(col("v").as("l2"), col("lbl").as("lbl2")),
          col("lbl") === col("l2"), "left")
        .select(col("v"), least(col("lbl"), coalesce(col("lbl2"), col("lbl"))).as("lbl"))
    var prevSum = lblSum(labels)
    var round = 0
    var changed = true
    while (changed && round < 50) {
      val nbrLbl = und
        .join(labels.select(col("v").as("nbr"), col("lbl")), "nbr")
        .select(col("v"), col("lbl"))
      val hopped = labels.select(col("v"), col("lbl"))
        .union(nbrLbl)
        .groupBy(col("v")).agg(min(col("lbl")).as("lbl"))
      val next = persist(shortcut(hopped))
      val nextSum = lblSum(next)
      changed = nextSum.compareTo(prevSum) != 0
      prevSum = nextSum
      labels = next
      round += 1
    }
    println(s"PROF cc-double rounds=$round")
    labels
  }

  // ---- pre-r21 pageRank (nodes recomputed per iteration) ----
  private def prOld(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val s = nodes.sparkSession
    import s.implicits._
    val outW = edges.groupBy($"src").agg(sum($"w").as("out_w"))
    val e = edges.join(outW, "src").localCheckpoint()
    var ranks = nodes.select($"item", lit(1000000L).as("rank_ppm"))
    for (i <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("item", "src"), "src")
        .withColumn("c", expr("(((rank_ppm * 85) div 100) * w) div out_w"))
        .groupBy($"dst")
        .agg(sum($"c").as("in_sum"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "item"), Seq("item"), "left")
        .select($"item",
          (lit(150000L) + coalesce($"in_sum", lit(0L))).as("rank_ppm"))
      if (i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("iterab", "32")
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    graft.functions.GraftFunctions.registerDotD(s)
    val d = "/root/testdata/sf0.1"

    // CC input: the t_neardup_clusters edge set by default; pass "mm"
    // to use the (larger) multimodal union edge set instead. Either way
    // checkpointed so both variants read identical in-memory input.
    val edges = (if (args.contains("mm")) {
      val docs = TextOps.fannedDocsOf(s, d)
      val emb = graft.sources.Tables.embeddings(s, d)
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"text_hash")
      val ex = docs.withColumn("text_hash", md5($"text"))
        .withColumn("rep", min($"doc_id").over(w))
        .filter($"doc_id" =!= $"rep").select($"rep".as("doc_a"), $"doc_id".as("doc_b"))
      val dv = emb.join(docs.select($"doc_id"), $"vec_id" === $"doc_id")
        .select($"vec_id", $"embedding")
      ex.union(TextOps.minhashPairs(TextOps.shinglesOfDf(docs)))
        .union(VectorOps.semanticPairs(dv))
    } else TextOps.minhashPairs(TextOps.docShingles(s, d))).localCheckpoint(true)
    println("PROF edges=" + edges.count())

    // pageRank input: the live ev/transition frames (rebuilt per rep —
    // the rescan cost IS the thing variant B measures)
    def evDf: DataFrame = graft.sources.Tables.events(s, d)
      .withColumn("item", regexp_extract(col("props"), "(\\d+)", 1).cast("long"))
      .withColumn("day", expr("ts_sec div 86400"))
    def prNew(): Long = {
      val evs = evDf
      val nodes = evs.filter($"item".isNotNull).select($"item").distinct()
      GraphOps.pageRankOn(nodes, GraphOps.transitionEdges(evs), 5).count()
    }
    def prOldRun(): Long = {
      val evs = evDf
      val nodes = evs.filter($"item".isNotNull).select($"item").distinct()
      prOld(nodes, GraphOps.transitionEdges(evs), 5).count()
    }

    def reset(): Unit = { System.gc() }
    def bench(tag: String, reps: Int)(variants: (String, () => Long)*): Unit = {
      variants.foreach { case (_, f) => f() } // warm both
      val out = collection.mutable.Map(variants.map(_._1 -> List.empty[Double]): _*)
      for (r <- 1 to reps; (v, f) <- variants) {
        reset()
        val t0 = System.nanoTime()
        val n = f()
        val dt = (System.nanoTime() - t0) / 1e9
        out(v) = out(v) :+ dt
        println(f"PROF $tag-$v%-8s rep=$r $dt%.2f s rows=$n")
      }
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      val meds = variants.map { case (v, _) => v -> med(out(v)) }
      println("PROF " + tag + "-ab " + meds.map { case (v, m) => f"$v=$m%.2f" }.mkString(" ") +
        f" ratio=${meds.head._2 / meds.last._2}%.2f")
    }

    if (args.contains("double")) {
      val live = TextOps.connectedComponentsStats(edges)
      println(s"PROF cc-live rounds=${live.rounds}")
      val a = live.labels.select("v", "lbl")
      val b = ccDouble(edges).select("v", "lbl")
      println("PROF cc-double-equiv diff=" +
        (a.exceptAll(b).count() + b.exceptAll(a).count()) + " (must be 0)")
      bench("ccd", 5)(
        "single" -> (() => TextOps.connectedComponentsStats(edges).labels.count()),
        "double" -> (() => ccDouble(edges).count()))
    } else {
      bench("cc", 5)(
        "old" -> (() => ccOld(edges).count()),
        "new" -> (() => TextOps.connectedComponentsStats(edges).labels.count()))
      bench("pr", 5)(
        "old" -> (() => prOldRun()),
        "new" -> (() => prNew()))
    }
    s.stop()
  }
}
