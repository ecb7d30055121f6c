package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paired A/B (r21): are the fanned-scan + shared-subtree checkpoints a
  * win for the LIGHT token pipelines (plain tokenize, no per-shingle
  * hashing)? The shingle pipelines measured clear wins; these cheaper
  * pipelines pay the same exchange + materialization barrier for less
  * saved CPU, so each is measured, not assumed.
  * Run: sbt "Test/runMain graft.queries.ProfTok"
  */
object ProfTok {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("tokab", "32")
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    graft.functions.GraftFunctions.registerDotD(s)
    val d = "/root/testdata/sf0.1"
    val queryTerms = Seq("spark", "join", "window")
    val searchK = 15

    // ---- pre-r21 bm25 (unfanned, postings double-computed) ----
    def docsRaw = graft.sources.Tables.documents(s, d)
    def oldProbed: DataFrame = docsRaw
      .select($"doc_id", TextOps.toks.as("tk"))
      .withColumn("dl", size($"tk").cast("long"))
      .select($"doc_id", $"dl", explode($"tk").as("t"))
      .filter($"t".isin(queryTerms: _*))
      .groupBy($"doc_id", $"dl", $"t")
      .agg(count(lit(1)).as("tf"))
    def oldBm25(): Long = {
      val r = docsRaw.select(size(TextOps.toks).cast("long").as("dl"))
        .agg(sum($"dl"), count(lit(1))).first()
      val (tl, n) = (r.getLong(0), r.getLong(1))
      val postings = oldProbed
      val dfT = postings.groupBy($"t").agg(count(lit(1)).as("df"))
        .withColumn("idf_ppm", expr(s"(${n}L * 1000000L) div df"))
      postings
        .join(broadcast(dfT.select($"t", $"idf_ppm")), "t")
        .withColumn("sat_pp6", expr(
          s"(22000000L * tf * ${tl}L) div (10L * tf * ${tl}L + 3L * ${tl}L + 9L * dl * ${n}L)"))
        .groupBy($"doc_id")
        .agg(sum($"idf_ppm" * $"sat_pp6").as("score_pp12"))
        .orderBy($"score_pp12".desc, $"doc_id")
        .limit(searchK)
        .withColumn("rnk",
          row_number().over(Window.orderBy($"score_pp12".desc, $"doc_id")).cast("long"))
        .count()
    }
    def newBm25(): Long = graft.SparkEntry.queries("t_bm25_search")(s, d).count()

    // ---- pre-r21 unigram LM (no checkpoints) ----
    def oldUnigram(): Long = {
      val docsDf = TextOps.fannedDocsOf(s, d)
      val tokRows = docsDf.select($"doc_id", explode(TextOps.toks).as("token"))
      val cnts = tokRows.groupBy($"token").agg(count(lit(1)).as("cnt"))
      val total = cnts.agg(sum($"cnt").cast("long").as("n_total"))
      tokRows.join(cnts, "token")
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast("long").as("n_toks"), sum($"cnt").cast("long").as("sum_cnt"))
        .crossJoin(broadcast(total))
        .select($"doc_id", $"n_toks", $"sum_cnt",
          expr("(1000000 * sum_cnt) div (n_toks * n_total)").as("score_ppm"))
        .count()
    }
    def newUnigram(): Long = graft.SparkEntry.queries("t_unigram_lm")(s, d).count()

    // ---- pre-r21 boilerplate (no checkpoint) ----
    def oldBoiler(): Long = {
      val sh = TextOps.docShingles(s, d)
      val docFreq = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
      sh.join(docFreq, "sh")
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast("long").as("n_shingles"),
          sum(when($"df" >= 2, 1L).otherwise(0L)).cast("long").as("n_shared"))
        .withColumn("boiler_pct", expr("(100 * n_shared) div n_shingles"))
        .count()
    }
    def newBoiler(): Long = graft.SparkEntry.queries("t_boilerplate")(s, d).count()

    def bench(tag: String, reps: Int)(variants: (String, () => Long)*): Unit = {
      variants.foreach { case (_, f) => f() }
      val out = collection.mutable.Map(variants.map(_._1 -> List.empty[Double]): _*)
      for (r <- 1 to reps; (v, f) <- variants) {
        System.gc()
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

    bench("bm25", 5)("old" -> (() => oldBm25()), "new" -> (() => newBm25()))
    bench("unigram", 5)("old" -> (() => oldUnigram()), "new" -> (() => newUnigram()))
    bench("boiler", 5)("old" -> (() => oldBoiler()), "new" -> (() => newBoiler()))
    s.stop()
  }
}
