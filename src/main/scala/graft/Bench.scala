package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local("graft-bench", cpus)
    // Headline set only (Catalog.benchNames); a full-catalog run is
    // available via SPARK_GRAFT_BENCH_ALL=1.
    val names =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ALL")) queries.Catalog.all.map(_.name)
      else queries.Catalog.benchNames
    // Untimed warmup at the smallest SF: JIT/codegen/classloading otherwise
    // lands entirely on whichever query happens to run first (~5s skew).
    // Each query warms independently so one failure can't skip the rest.
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    // Best-of-3 per query: single-run local timings swing 2-3x with GC and
    // JIT recompilation; the min is the stable, reproducible figure. Only
    // SUCCESSFUL reps count - a rep that throws must not publish its
    // time-to-failure as a (fast-looking) timing. All-failed -> null in
    // `queries` plus an entry in `failed`, so a consumer summing the map
    // reconciles with `total` and can never mistake a marker for a timing.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val results: Seq[(String, Seq[Double])] = names.map { name =>
      val fn = SparkEntry.queries(name)
      // settle the heap between queries: in long full-catalog runs, garbage
      // from earlier queries otherwise lands as GC pauses inside later ones
      // (measured 0.5s -> 3.4s drift on late queries without this)
      System.gc()
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => None }
      }
      name -> times
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.minOption.fold("null")(_.toString) }
      .mkString("{", ",", "}")
    // every successful rep, so a reader can see the published number is
    // min-of-n rather than a single (possibly GC-skewed) run
    val allReps = results
      .map { case (k, v) => s"\"" + k + "\":" + v.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v.isEmpty => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2.minOption).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$allReps,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
