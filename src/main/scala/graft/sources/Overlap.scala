package graft.sources

/** Run independent Spark actions from a small driver thread pool (guide
  * §2.6 overlap): actions are only sequential because driver code calls
  * them sequentially, and a lifecycle write's component jobs (a handful
  * of small parquet writes per index root) each pay the local job floor
  * — overlapping them lets the next component's tasks back-fill cores
  * idled by the current one's commit tail. Used by the index-build
  * writers (components of ONE epoch, manifest commit strictly after all
  * of them land) and the stored-fleet drills (independent roots).
  *
  * `-Dgraft.overlap.sequential=true` (or SPARK_GRAFT_OVERLAP=off) runs
  * the tasks in declaration order on the caller thread — the paired-A/B
  * switch (ProfFleet) and the escape hatch for a driver where
  * concurrent root builds would contend with higher-priority jobs.
  * Failure semantics match the sequential form: the first failing
  * task's exception propagates (remaining tasks may have run — exactly
  * the crash window the manifest protocol already tolerates, since
  * nothing commits until the caller does).
  */
private[graft] object Overlap {

  private def sequentialMode: Boolean =
    sys.props.get("graft.overlap.sequential").contains("true") ||
      sys.env.get("SPARK_GRAFT_OVERLAP").contains("off")

  def run(tasks: (String, () => Unit)*): Unit = {
    if (tasks.size <= 1 || sequentialMode) { tasks.foreach(_._2()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map { case (_, f) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = f()
        })
      }
      try futs.foreach(_.get())
      catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
    } finally pool.shutdown()
  }
}
