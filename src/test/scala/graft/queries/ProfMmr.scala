package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paired A/B for the r21 verdict's Next #7 (v_mmr_rerank): the greedy
  * MMR recursion is sequential by definition, but its checkpoint
  * DISCIPLINE is not — the live path uses EAGER localCheckpoint(true)
  * on the pool, the pairwise sims, and every round's selected frame
  * (3 + mmrPick-1 = 7 materialization jobs per query). The CC lesson
  * (one job per round: the consuming action materializes a LAZY
  * checkpoint as a side effect) suggests lazy everywhere, with the
  * round count unchanged. Variant A = live query; variant B = the same
  * pipeline with every checkpoint lazy. Equivalence asserted before
  * timing. Alternating reps in ONE session.
  *
  * Run: sbt "Test/runMain graft.queries.ProfMmr"
  */
object ProfMmr {
  private val mmrPool = 20
  private val mmrPick = 5

  // the live mmrRerank pipeline with a switchable checkpoint mode
  private def mmr(d: String, s: org.apache.spark.sql.SparkSession, eager: Boolean): DataFrame = {
    import s.implicits._
    val ck: DataFrame => DataFrame = df => df.localCheckpoint(eager)
    graft.functions.GraftFunctions.registerDotD(s)
    val emb = graft.sources.Tables.embeddings(s, d)
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val cand = emb.select($"vec_id".as("cand_id"), $"embedding".as("c_emb"))
    def dotd(a: String, b: String) = expr(s"dot_d($a, $b)")
    def micros(c: org.apache.spark.sql.Column) = floor(c * lit(1e6)).cast("long")
    val wPool = Window.partitionBy($"query_id").orderBy($"simq".desc, $"cand_id")
    val pool = ck(cand
      .join(broadcast(q), $"cand_id" =!= $"query_id")
      .withColumn("simq",
        micros(dotd("q_emb", "c_emb") /
          (sqrt(dotd("q_emb", "q_emb")) * sqrt(dotd("c_emb", "c_emb")))))
      .withColumn("rnk", row_number().over(wPool))
      .filter($"rnk" <= mmrPool)
      .select($"query_id", $"cand_id", $"c_emb", $"simq"))
    val pairs = ck(pool.select($"query_id", $"cand_id".as("a"), $"c_emb".as("a_emb"))
      .join(pool.select($"query_id", $"cand_id".as("b"), $"c_emb".as("b_emb")),
        Seq("query_id"))
      .filter($"a" =!= $"b")
      .withColumn("ab",
        micros(dotd("a_emb", "b_emb") /
          (sqrt(dotd("a_emb", "a_emb")) * sqrt(dotd("b_emb", "b_emb")))))
      .select($"query_id", $"a", $"b", $"ab"))
    val poolS = pool.drop("c_emb")
    val wSel = Window.partitionBy($"query_id").orderBy($"mmr".desc, $"cand_id")
    var selected = poolS
      .withColumn("mmr", lit(85L) * $"simq")
      .withColumn("r", row_number().over(wSel))
      .filter($"r" === 1)
      .select($"query_id", $"cand_id", lit(1L).as("pick"), $"mmr")
    for (i <- 2 to mmrPick) {
      val maxSel = pairs
        .join(selected.select($"query_id", $"cand_id".as("b")), Seq("query_id", "b"))
        .groupBy($"query_id", $"a").agg(max($"ab").as("max_sel"))
        .withColumnRenamed("a", "cand_id")
      val next = poolS
        .join(selected.select($"query_id", $"cand_id"),
          Seq("query_id", "cand_id"), "left_anti")
        .join(maxSel, Seq("query_id", "cand_id"))
        .withColumn("mmr", lit(85L) * $"simq" - lit(15L) * $"max_sel")
        .withColumn("r", row_number().over(wSel))
        .filter($"r" === 1)
        .select($"query_id", $"cand_id", lit(i.toLong).as("pick"), $"mmr")
      selected = ck(selected.unionByName(next))
    }
    selected
  }

  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("mmr22", "32")
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    // equivalence first: both modes must pick identical rows
    val a = mmr(d, s, eager = true)
    val b = mmr(d, s, eager = false)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"PROF mmr-equiv diff=$diff (must be 0)")

    def run(eager: Boolean): Long = mmr(d, s, eager).count()
    run(true); run(false) // warm
    val reps = 5
    val out = collection.mutable.Map("eager" -> List.empty[Double], "lazy" -> List.empty[Double])
    for (r <- 1 to reps; v <- Seq("eager", "lazy")) {
      System.gc()
      val t0 = System.nanoTime()
      val n = run(v == "eager")
      val dt = (System.nanoTime() - t0) / 1e9
      out(v) = out(v) :+ dt
      println(f"PROF mmr-$v%-5s rep=$r $dt%.2f s rows=$n")
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    val (e, l) = (med(out("eager")), med(out("lazy")))
    println(f"PROF mmr-ab eager=$e%.2f lazy=$l%.2f ratio=${e / l}%.2f")
    s.stop()
  }
}
