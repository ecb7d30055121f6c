package graft.sources

import java.nio.file.{Files, Path}

/** Per-JVM scratch root for catalog queries that stage a stored index
  * as part of their own plan (the `t_delta_*_day3` lifecycle rows used
  * to `createTempDirectory` per invocation and never delete it, leaking
  * a full shingle/LSH index per Verify/Bench run — the round-14
  * advisor's finding). All scratch dirs now hang off ONE root that a
  * shutdown hook deletes recursively, so disk usage is bounded by the
  * live JVM, not by the run count. Deletion is best-effort (a file still
  * open at exit is skipped, not fatal) — the root carries a recognizable
  * prefix so any survivor is obvious to a janitor.
  */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteQuietly(r)))
    r
  }

  private def deleteQuietly(p: Path): Unit =
    try {
      import scala.util.Using
      if (Files.exists(p)) Using.resource(Files.walk(p)) { st =>
        st.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => try Files.delete(f) catch { case _: Exception => () })
      }
    } catch { case _: Exception => () }

  /** A fresh directory under the per-JVM root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString
}
