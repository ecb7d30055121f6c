package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Commit-marker protocol shared by the stored-index family (LSH bands,
  * postings, IVF-PQ codes, transition graph): every index directory
  * carries a tiny `_graft_manifest.json` naming the committed EPOCH and
  * the artifact format version. Writers stage a new epoch's data first
  * and flip the manifest last; readers resolve the manifest first and
  * see only committed epochs. This closes the crash hole every appender
  * used to document ("production wraps the pair in a commit marker"):
  *
  *   - **Atomicity**: an append that dies after its data writes but
  *     before the manifest flip is INVISIBLE — readers still resolve
  *     the previous epoch; the orphan `epoch=N+1` directories are inert.
  *   - **Idempotent retry**: every staged write targets its epoch's own
  *     directory with overwrite semantics, so re-running a failed append
  *     replaces the orphan data instead of doubling it, then commits.
  *   - **Format versioning**: a reader meeting a pre-manifest directory
  *     or a stale `format_version` fails fast with a rebuild-the-index
  *     message instead of an opaque schema error downstream (the failure
  *     mode the round-13 advisor flagged for the postings dl column).
  *
  * Component layouts under `<indexPath>/<component>/`:
  *
  *   - **Rewrite components** (term df, corpus stats, bucket counts,
  *     graph edges/nodes): each epoch is a FULL copy under
  *     `component/epoch=N/`; readers read exactly the committed epoch's
  *     directory. These tables are small (vocabulary / bucket / graph
  *     grain, not corpus grain), so a per-epoch copy is cheap — and the
  *     old epoch stays live for readers mid-append (snapshot isolation
  *     for free). A merge plan can now lazily read epoch N-1 while
  *     writing epoch N: no more localCheckpoint-before-self-overwrite.
  *   - **Append-only components** (band rows, postings, PQ codes): each
  *     append lands under `component/epoch=N/` (nested partition dirs
  *     like `bucket=K` below it); readers scan the base directory and
  *     prune `epoch <= committed` via partition discovery, so the
  *     corpus-sized table is never copied and uncommitted epochs are
  *     pruned at the directory level, not row-filtered.
  *
  * The manifest flip itself is a temp-file write + atomic rename —
  * atomic on local and HDFS-like filesystems. On S3-class object stores
  * the rename becomes copy+delete; production there swaps the rename
  * for a conditional PUT (the same adaptation every manifest-based
  * table format ships), which changes none of the callers.
  *
  * Epoch values are compared against old stock: a pre-manifest index
  * has no `_graft_manifest.json` and no `epoch=` level, so the fail-fast
  * triggers before any schema confusion can.
  */
object IndexManifest {

  /** Bump when a stored artifact's schema changes incompatibly.
    * Version 2 = manifest protocol + positional postings (`positions`
    * on posting rows, `dl` denormalized).
    */
  val FormatVersion = 2

  final case class State(formatVersion: Int, epoch: Long)

  private def manifestFile(path: String) = Paths.get(path, "_graft_manifest.json")

  /** Parse the manifest if present. Hand-rolled parse of the two-field
    * object this module itself writes — no JSON library surface.
    */
  def read(path: String): Option[State] = {
    val f = manifestFile(path)
    if (!Files.exists(f)) None
    else {
      val s = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      def field(k: String): Option[Long] =
        s""""$k"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
      for (v <- field("format_version"); e <- field("epoch"))
        yield State(v.toInt, e)
    }
  }

  /** The committed epoch, or fail fast when the index is unreadable by
    * this build (missing manifest = pre-manifest stock or a build that
    * crashed before its first commit; version skew = older artifact
    * schema). Both mean: rebuild the index.
    */
  def committedEpoch(path: String): Long = read(path) match {
    case Some(State(FormatVersion, e)) => e
    case Some(State(v, _)) =>
      throw new IllegalStateException(
        s"index at $path has format_version $v, this build reads $FormatVersion " +
          "- rebuild the index (write*Index) before searching it")
    case None =>
      throw new IllegalStateException(
        s"no commit manifest at $path - either the index predates the manifest " +
          "format or its build crashed before commit; rebuild the index (write*Index)")
  }

  /** Flip the manifest to `epoch` — the commit point. Write-then-rename
    * so a crash mid-commit leaves either the old manifest or the new
    * one, never a torn file.
    */
  def commit(path: String, epoch: Long): Unit = {
    Files.createDirectories(Paths.get(path))
    val body =
      s"""{"format_version": $FormatVersion, "epoch": $epoch}\n"""
    val tmp = Paths.get(path, s"._graft_manifest.$epoch.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestFile(path),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Staging directory for one component at one epoch. */
  def epochDir(path: String, component: String, epoch: Long): String =
    s"$path/$component/epoch=$epoch"

  /** Read a REWRITE component: exactly the committed epoch's full copy. */
  def readRewrite(s: SparkSession, path: String, component: String): DataFrame =
    s.read.parquet(epochDir(path, component, committedEpoch(path)))

  /** Read an APPEND-ONLY component: all epochs up to the committed one,
    * pruned at the directory level (epoch is a discovered partition
    * column against `basePath`; nested partition columns like
    * `bucket` survive and still prune).
    */
  def readAppendOnly(s: SparkSession, path: String, component: String): DataFrame = {
    val base = s"$path/$component"
    s.read.option("basePath", base).parquet(base)
      .filter(col("epoch") <= committedEpoch(path))
      .drop("epoch")
  }
}
