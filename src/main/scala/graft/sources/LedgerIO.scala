package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileStatus, FileSystem, Options, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Control-plane file IO for the stored-index fleet — the manifests,
  * pin ledgers, and batch/intent ledgers behind every stored family.
  * These are tiny driver-side files whose only requirements are
  * read-what-was-committed and atomic replace; everything here goes
  * through the Hadoop FileSystem API resolved from the path's OWN
  * scheme, so an index root can live wherever its data lives
  * (`file://`, `hdfs://`, `s3a://`, a plain local path) — previously
  * the export DATA plane was FS-agnostic while the manifest that makes
  * a clone readable could only be written to a local path, which made
  * non-local index roots impossible outright.
  *
  * STORE-ATOMICITY MATRIX for the write-tmp-then-rename(OVERWRITE)
  * discipline every writer here uses:
  *
  *   - `file://` (and schemeless local): ATOMIC — local renames go
  *     through java.nio's ATOMIC_MOVE (a true POSIX rename; see
  *     [[renameOverwrite]] for why NOT FileContext here); readers see
  *     the old file or the new one, never a torn write or a missing
  *     file.
  *   - `hdfs://`: ATOMIC — HDFS's AbstractFileSystem implements the
  *     native rename-with-OVERWRITE (the same primitive every
  *     manifest-based table format leans on).
  *   - `s3a://` and object stores generally: NOT atomic — rename is
  *     copy+delete. Two mitigations keep the protocol sound there:
  *     (a) readers only ever resolve the final name, and the copy's
  *     source is a tmp file no reader resolves, so a torn rename leaves
  *     the OLD committed file visible (the delete-half failing leaves a
  *     stray tmp, which stagers overwrite on retry); (b) the fleet's
  *     loud single-writer contract ([[IndexManifest]]'s commit-time
  *     re-checks) means no concurrent committer exists to interleave
  *     with the window. A deployment wanting a hard atomic commit on an
  *     object store swaps [[writeAtomic]]'s rename for a conditional
  *     PUT (if-match on the manifest's ETag) — a one-function
  *     adaptation that changes no caller.
  *
  * Configuration: the active Spark session's Hadoop conf (it carries
  * the deployment's `fs.*` wiring — credentials, endpoints); a bare
  * default conf when no session exists (pure-JVM unit drills, where
  * only `file://` is reachable anyway).
  */
private[graft] object LedgerIO {

  def conf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration).getOrElse(new Configuration())

  def fs(p: HPath): FileSystem = p.getFileSystem(conf) match {
    // control-plane files are tiny one-line JSON/number files whose
    // integrity is validated by their parse; the checksummed local FS
    // would shadow every one with a `.crc` sibling — litter in the
    // index root that the FileContext rename (whose local binding is
    // raw) would strand one file per commit. Raw local IO matches what
    // java.nio did here before the port.
    case l: org.apache.hadoop.fs.LocalFileSystem => l.getRawFileSystem
    case other => other
  }

  /** Child path under a root given as plain path or URI — scheme
    * resolution rides on the Hadoop Path parser, once, here.
    */
  def child(dir: String, name: String): HPath = new HPath(dir, name)

  /** The root itself as a Hadoop path. */
  def root(dir: String): HPath = new HPath(dir)

  def exists(p: HPath): Boolean = fs(p).exists(p)

  def isDirectory(p: HPath): Boolean = {
    val f = fs(p)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  /** Read a small UTF-8 file, or None when it does not exist —
    * including the deleted-between-list-and-read race the pin ledger's
    * lock-free readers depend on (an already-released pin reads as "no
    * pin", never an exception).
    */
  def readIfExists(p: HPath): Option[String] = {
    val f = fs(p)
    try {
      val in = f.open(p)
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, true)
      Some(new String(out.toByteArray, StandardCharsets.UTF_8))
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Write `body` to `target` atomically: tmp file in the same
    * directory, then rename with OVERWRITE (see the atomicity matrix
    * in the object doc). Creates the parent directory if needed.
    */
  def writeAtomic(target: HPath, tmpName: String, body: String): Unit = {
    val f = fs(target)
    val parent = target.getParent
    f.mkdirs(parent)
    val tmp = new HPath(parent, tmpName)
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    renameOverwrite(tmp, target)
  }

  /** Atomic-where-the-store-supports-it rename replacing any existing
    * destination. Local paths go through java.nio's ATOMIC_MOVE — the
    * real POSIX rename: FileContext's local binding does NOT override
    * `renameInternal(overwrite)`, so its OVERWRITE lowers to
    * delete-then-rename, which opens a missing-file window on every
    * manifest re-commit (a concurrent reader would see "no commit
    * manifest" mid-append) and a crash between the two calls destroys
    * the committed file outright. Non-local schemes use FileContext
    * (HDFS's AbstractFileSystem implements the native atomic
    * rename-with-overwrite; stores without one fall back to the
    * default delete+rename — the object-store caveat in the class doc).
    */
  def renameOverwrite(src: HPath, dst: HPath): Unit = {
    val q = fs(dst).makeQualified(dst)
    if (q.toUri.getScheme == "file") {
      val qs = fs(src).makeQualified(src)
      require(qs.toUri.getScheme == "file",
        s"renameOverwrite: cross-scheme rename $qs -> $q is not a rename at all " +
          "- reinterpreting the remote path locally would move the wrong file")
      java.nio.file.Files.move(
        java.nio.file.Paths.get(qs.toUri.getPath),
        java.nio.file.Paths.get(q.toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      val fc = FileContext.getFileContext(q.toUri, conf)
      fc.rename(fs(src).makeQualified(src), q, Options.Rename.OVERWRITE)
    }
  }

  /** Delete a file (non-recursive); false when it did not exist. */
  def deleteIfExists(p: HPath): Boolean =
    try fs(p).delete(p, false)
    catch { case _: java.io.FileNotFoundException => false }

  /** Recursive directory delete; false when it did not exist. */
  def deleteRecursive(p: HPath): Boolean =
    try fs(p).delete(p, true)
    catch { case _: java.io.FileNotFoundException => false }

  /** Directory listing; empty when the directory does not exist. */
  def listStatus(dir: HPath): Seq[FileStatus] =
    try fs(dir).listStatus(dir).toVector
    catch { case _: java.io.FileNotFoundException => Vector.empty }
}
