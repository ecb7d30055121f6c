package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paired A/B (r21): the two remaining adopted shared-subtree
  * checkpoints, proven rather than assumed after ProfTok/ProfIvfRanked
  * showed the pattern loses on cheap subtrees:
  *  - cascadeTopK's tier-1 screen checkpoint (v_cascade_search)
  *  - pairSupport's uic checkpoint (e_item_cooccur)
  * Run: sbt "Test/runMain graft.queries.ProfCkptAB"
  */
object ProfCkptAB {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("ckptab", "32")
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    graft.functions.GraftFunctions.registerDotD(s)
    val d = "/root/testdata/sf0.1"

    // ---- pre-r21 pairSupport (no checkpoint) over the cooccur query ----
    def oldCooccur(): Long = {
      val ev = graft.sources.Tables.events(s, d)
        .withColumn("item", regexp_extract(col("props"), "(\\d+)", 1).cast("long"))
      val ui = ev.filter($"item".isNotNull).select($"user_id", $"item").distinct()
      val w = Window.partitionBy(col("user_id"))
      val uic = ui.withColumn("deg", count(lit(1)).over(w))
        .filter(col("deg") <= 100L).drop("deg")
      uic.select(col("user_id"), col("item").as("i1"))
        .join(uic.select(col("user_id"), col("item").as("i2")), "user_id")
        .filter(col("i1") < col("i2"))
        .groupBy(col("i1"), col("i2"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"n_users".desc, $"i1", $"i2")
        .limit(20)
        .count()
    }
    def newCooccur(): Long = graft.SparkEntry.queries("e_item_cooccur")(s, d).count()
    def newCascade(): Long = graft.SparkEntry.queries("v_cascade_search")(s, d).count()

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

    bench("cooccur", 5)("old" -> (() => oldCooccur()), "new" -> (() => newCooccur()))
    s.stop()
  }
}
