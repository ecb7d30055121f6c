package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paired A/B (r21): the rk<=nProbe ranked-assignment checkpoint vs the
  * pre-r21 double window pass (assigned + probes as independent
  * branches). Run: sbt "Test/runMain graft.queries.ProfIvfRanked"
  */
object ProfIvfRanked {
  private val nCells = 16
  private val nQueries = 5
  private val nProbe = 4
  private val topK = 10

  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("ivfranked", "32")
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    graft.functions.GraftFunctions.registerDotD(s)
    val d = "/root/testdata/sf0.1"
    val emb = graft.sources.Tables.embeddings(s, d)

    def micros(c: org.apache.spark.sql.Column) = floor(c * lit(1e6)).cast("long")
    def dotd(a: String, b: String) = expr(s"dot_d($a, $b)")

    // pre-r21: dists feeds assigned and probes as two plan branches
    def oldNprobe(): Long = {
      val cents = emb.filter($"vec_id" < nCells)
        .select($"vec_id".as("cell"), $"embedding".as("c_emb"))
      val wAssign = Window.partitionBy($"vec_id").orderBy($"d2_micros".asc, $"cell".asc)
      val dists = emb.join(broadcast(cents))
        .withColumn("d2_micros",
          micros(dotd("embedding", "embedding") + dotd("c_emb", "c_emb")
            - lit(2.0) * dotd("embedding", "c_emb")))
        .withColumn("rk", row_number().over(wAssign))
      val assigned = dists.filter($"rk" === 1).select($"vec_id", $"cell", $"embedding")
      val probes = dists
        .filter($"vec_id" >= nCells && $"vec_id" < nCells + nQueries && $"rk" <= nProbe)
        .select($"vec_id".as("query_id"), $"cell".as("q_cell"), $"embedding".as("q_emb"))
      val wTop = Window.partitionBy($"query_id").orderBy($"sim_micros".desc, $"cand_id")
      assigned
        .select($"vec_id".as("cand_id"), $"cell", $"embedding".as("c_emb2"))
        .join(broadcast(probes), $"cell" === $"q_cell" && $"cand_id" =!= $"query_id")
        .withColumn("sim_micros",
          micros(dotd("q_emb", "c_emb2") /
            (sqrt(dotd("q_emb", "q_emb")) * sqrt(dotd("c_emb2", "c_emb2")))))
        .withColumn("rnk", row_number().over(wTop).cast("long"))
        .filter($"rnk" <= topK)
        .count()
    }
    def newNprobe(): Long = graft.SparkEntry.queries("v_ivf_nprobe")(s, d).count()
    def newResidual(): Long = graft.SparkEntry.queries("v_ivfpq_residual")(s, d).count()

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

    bench("nprobe", 5)("old" -> (() => oldNprobe()), "new" -> (() => newNprobe()))
    s.stop()
  }
}
