package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paired A/B (r21): IVF cell assignment as the live broadcast-join +
  * row_number window vs a pure-projection argmin — a 1-row broadcast
  * centroid panel folded per row with array_min over (d2, cell) structs.
  * The projection form has NO exchange and NO sort (the window form
  * pays Sort + WindowGroupLimit + Exchange + Sort), at the price of the
  * transform lambda running on the interpreted expression path
  * (dot_d's nullSafeEval). Which side of that trade wins is measured
  * here, driven through the two heaviest consumers.
  * Run: sbt "Test/runMain graft.queries.ProfIvf"
  */
object ProfIvf {
  private val nCells = 16

  /** Candidate: argmin as a projection over a broadcast centroid panel. */
  private[queries] def ivfCellsNew(emb: DataFrame): DataFrame = {
    val cents = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
    val panel = cents.agg(
      sort_array(collect_list(struct(col("cell"), col("c_emb")))).as("cents"))
    emb.join(broadcast(panel))
      .withColumn("vv", expr("dot_d(embedding, embedding)"))
      .withColumn("best", array_min(expr(
        """transform(cents, c -> named_struct(
          |  'd2', FLOOR(((vv + dot_d(c.c_emb, c.c_emb)) - (2.0D * dot_d(embedding, c.c_emb))) * 1000000.0D),
          |  'cell', c.cell))""".stripMargin)))
      .filter(col("best.cell").isNotNull)
      .select(col("vec_id"), col("best.cell").as("cell"), col("embedding"))
  }

  /** The live window form, inlined (pre-r21 shape). */
  private def ivfCellsOld(emb: DataFrame): DataFrame = {
    val cents = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("d2_micros").asc, col("cell").asc)
    emb
      .join(broadcast(cents))
      .withColumn(
        "d2_micros",
        expr("FLOOR(((dot_d(embedding, embedding) + dot_d(c_emb, c_emb)) - (2.0D * dot_d(embedding, c_emb))) * 1000000.0D)"))
      .withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cell"), col("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("ivfab", "32")
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.registerDotD(s)
    val d = "/root/testdata/sf0.1"
    val emb = graft.sources.Tables.embeddings(s, d)

    // equivalence first: identical (vec_id, cell) assignments
    val a = ivfCellsOld(emb).select("vec_id", "cell")
    val b = ivfCellsNew(emb).select("vec_id", "cell")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"PROF ivf-equiv diff=$diff (must be 0)")

    def noop(df: DataFrame): Long = { df.write.format("noop").mode("overwrite").save(); 0L }
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

    // bare assignment
    bench("assign", 5)(
      "old" -> (() => noop(ivfCellsOld(emb))),
      "new" -> (() => noop(ivfCellsNew(emb))))

    // through the heaviest consumer shape: the within-cell pair join
    def pairsVia(cells: DataFrame => DataFrame): Long = {
      val assigned = cells(emb).localCheckpoint(false)
      val ok = assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_c"))
        .filter(col("n_c") <= (1 << 10)).select(col("cell"))
      val ag = assigned.join(broadcast(ok), "cell")
      val l = ag.select(col("vec_id").as("doc_a"), col("embedding").as("emb_a"), col("cell"))
      val r = ag.select(col("vec_id").as("doc_b"), col("embedding").as("emb_b"), col("cell").as("cell_b"))
      l.join(r, col("cell") === col("cell_b") && col("doc_a") < col("doc_b"))
        .withColumn("sim_micros",
          expr("FLOOR((dot_d(emb_a, emb_b) / (sqrt(dot_d(emb_a, emb_a)) * sqrt(dot_d(emb_b, emb_b)))) * 1000000.0D)"))
        .filter(col("sim_micros") >= 850000L)
        .count()
    }
    bench("pairs", 5)(
      "old" -> (() => pairsVia(ivfCellsOld)),
      "new" -> (() => pairsVia(ivfCellsNew)))
    s.stop()
  }
}
