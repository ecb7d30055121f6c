package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IndexManifest

/** One-call right-to-be-forgotten across the stored-artifact fleet.
  *
  * Eight index families persist derived state about documents and
  * users; each already has its own crash-atomic forget path (tombstone
  * or negated-count epoch + same-epoch stats give-back — see
  * IMPLEMENTATION.md's forget rows). This orchestrator is the missing
  * deployment surface: an erasure request arrives as "forget these
  * docs" / "forget these users", not as eight separate index calls.
  *
  * Scope by grain:
  *   - DOC grain  — postings (BM25), LSH (near-dup), shingle-df
  *     (novelty), SCD2 (dimension history), IVF-PQ and BQ (vector
  *     search; `vec_id` = `doc_id` in this corpus' contract).
  *   - USER grain — co-occurrence (self-attributing: the stored `ui`
  *     rows are the user's data) and the transition graph (aggregated:
  *     erasure needs the user's event slice from the source log).
  *
  * ATOMICITY, honestly: each family's forget commits its OWN manifest
  * epoch — there is no cross-index transaction, so a crash mid-fan-out
  * leaves a prefix of the families erased. Because replaying a
  * committed forget DOUBLE-SUBTRACTS give-back stats (every family's
  * documented ledger discipline), blind retry of the whole call is
  * wrong. The resume protocol uses the manifests themselves as the
  * ledger: families are processed in the FIXED order of
  * [[DocTargets.ordered]] / [[UserTargets.ordered]], and
  * [[committedEpochs]] snapshots each target's committed epoch. Record
  * that snapshot before calling; after a crash, every target whose
  * epoch ADVANCED is done (single-writer contract: nobody else moves
  * the manifest), so resume with [[DocTargets.remaining]] — the spec
  * drives exactly this crash-and-resume drill.
  */
object Erasure {

  /** The doc-grain stored artifacts one erasure request fans out to.
    * Every field is an index ROOT path (None = not deployed).
    */
  final case class DocTargets(
      postings: Option[String] = None,
      lsh: Option[String] = None,
      shingle: Option[String] = None,
      scd2: Option[String] = None,
      ivfPq: Option[String] = None,
      bq: Option[String] = None) {

    /** (family-tag, path) in the fixed processing order — the resume
      * protocol's ground truth.
      */
    def ordered: Seq[(String, String)] =
      Seq("postings" -> postings, "lsh" -> lsh, "shingle" -> shingle,
        "scd2" -> scd2, "ivfpq" -> ivfPq, "bq" -> bq)
        .collect { case (tag, Some(p)) => tag -> p }

    /** The targets whose committed epoch still equals the pre-call
      * snapshot — i.e. the families a crashed erasure did NOT reach.
      */
    def remaining(snapshot: Map[String, Long]): DocTargets = {
      def keep(tag: String, p: Option[String]): Option[String] =
        p.filter(path => snapshot.get(tag).forall(pre =>
          IndexManifest.committedEpoch(path, fmtOf(tag)) == pre))
      DocTargets(
        postings = keep("postings", postings),
        lsh = keep("lsh", lsh),
        shingle = keep("shingle", shingle),
        scd2 = keep("scd2", scd2),
        ivfPq = keep("ivfpq", ivfPq),
        bq = keep("bq", bq))
    }
  }

  /** The user-grain stored artifacts. `transition` erasure additionally
    * needs the users' event slice ([[forgetUsers]]' `userEvs`).
    */
  final case class UserTargets(
      cooccur: Option[String] = None,
      transition: Option[String] = None) {

    def ordered: Seq[(String, String)] =
      Seq("cooccur" -> cooccur, "transition" -> transition)
        .collect { case (tag, Some(p)) => tag -> p }

    def remaining(snapshot: Map[String, Long]): UserTargets = {
      def keep(tag: String, p: Option[String]): Option[String] =
        p.filter(path => snapshot.get(tag).forall(pre =>
          IndexManifest.committedEpoch(path, fmtOf(tag)) == pre))
      UserTargets(
        cooccur = keep("cooccur", cooccur),
        transition = keep("transition", transition))
    }
  }

  private def fmtOf(tag: String): IndexManifest.Format = tag match {
    case "postings"   => IndexManifest.Postings
    case "lsh"        => IndexManifest.Lsh
    case "shingle"    => IndexManifest.Shingle
    case "scd2"       => IndexManifest.Scd2
    case "ivfpq"      => IndexManifest.IvfPq
    case "bq"         => IndexManifest.Bq
    case "cooccur"    => IndexManifest.Cooccur
    case "transition" => IndexManifest.Transition
  }

  /** Snapshot each target's committed epoch — the caller's pre-call
    * ledger entry for the resume protocol.
    */
  def committedEpochs(targets: Seq[(String, String)]): Map[String, Long] =
    targets.map { case (tag, path) =>
      tag -> IndexManifest.committedEpoch(path, fmtOf(tag))
    }.toMap

  /** Erase documents from every deployed doc-grain artifact.
    * `docs` columns: `doc_id` always; `text` additionally when
    * `shingle` is targeted (negated-count forgetting re-shingles the
    * forgotten docs — the stored index keeps aggregated counts only).
    * Caller contract per family applies: ids currently indexed,
    * complete original text. Fixed processing order; see the class doc
    * for the crash/resume protocol.
    */
  def forgetDocs(docs: DataFrame, targets: DocTargets): Unit = {
    // one materialization feeds up to six fan-out reads
    val d = docs.localCheckpoint(true)
    val ids = d.select(col("doc_id"))
    val vecIds = d.select(col("doc_id").as("vec_id"))
    targets.ordered.foreach {
      case ("postings", p) => SearchOps.deleteFromPostingsIndex(ids, p)
      case ("lsh", p)      => TextOps.deleteFromLshIndex(ids, p)
      case ("shingle", p)  =>
        TextOps.forgetShingleDocs(d.select(col("doc_id"), col("text")), p)
      case ("scd2", p)     => TextOps.purgeScd2Docs(ids, p)
      case ("ivfpq", p)    => VectorOps.deleteFromIvfPqIndex(vecIds, p)
      case ("bq", p)       => VectorOps.deleteFromBqIndex(vecIds, p)
    }
  }

  /** Erase users from every deployed user-grain artifact. `users` has
    * column `user_id`; `userEvs` is the forgotten users' complete event
    * slice (with `item`, `ts_sec`, `event_id`), required exactly when
    * `transition` is targeted — the transition graph stores no per-user
    * attribution to erase from.
    */
  def forgetUsers(users: DataFrame, targets: UserTargets,
      userEvs: Option[DataFrame] = None): Unit = {
    require(targets.transition.isEmpty || userEvs.nonEmpty,
      "transition-graph erasure needs the users' event slice (userEvs)")
    val u = users.select(col("user_id")).localCheckpoint(true)
    targets.ordered.foreach {
      case ("cooccur", p)    => GraphOps.forgetCooccurUsers(u, p)
      case ("transition", p) =>
        GraphOps.forgetTransitionUsers(
          userEvs.get.join(u, Seq("user_id"), "left_semi"), p)
    }
  }

  /** ERASURE CERTIFICATE — auditable proof of absence, the compliance
    * artifact a deletion request closes with: for each audited doc id
    * and each ROW-TRACEABLE deployed family, the count of live index
    * rows still referencing it (tombstone-resolved, exactly what a
    * reader would serve). A forgotten doc must certify 0 across the
    * board; auditing a few NON-forgotten controls alongside proves the
    * scan actually looks (all-zeros-by-construction certifies nothing).
    *
    * Row-traceable: postings (one row per distinct term), LSH (one row
    * per band), IVF-PQ (one row per PQ subspace), BQ (one packed row).
    * The shingle index is NOT certifiable this way by design — it
    * stores aggregated counts with no doc attribution; its erasure is
    * certified by the negated-count epoch ledger instead. SCD2 purge
    * audits live in Scd2PurgeSpec (history rows are doc-keyed but the
    * family's oracle discipline covers them).
    *
    * Scale shape: one tombstone-resolved scan per family, semi-joined
    * to the bounded audit-id set before the per-doc count — no
    * corpus-sized state beyond the scans readers already do.
    */
  def certificate(s: SparkSession, targets: DocTargets, ids: DataFrame): DataFrame = {
    val idsDf = ids.select(col("doc_id").cast("long").as("doc_id"))
      .distinct().localCheckpoint(true)
    def refCounts(tag: String, path: String): Option[DataFrame] = (tag match {
      case "postings" => Some(SearchOps.storedPostings(s, path)
        .drop("epoch").select(col("doc_id")))
      case "lsh"      => Some(TextOps.storedLshBands(s, path).select(col("doc_id")))
      case "ivfpq"    => Some(VectorOps.storedIvfPqCodes(s, path)
        .select(col("vec_id").as("doc_id")))
      case "bq"       => Some(VectorOps.storedBqWords(s, path)
        .select(col("vec_id").as("doc_id")))
      case _          => None // shingle: count-aggregated; scd2: see scaladoc
    }).map { rows =>
      rows.join(idsDf, Seq("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    }
    val per = targets.ordered.flatMap { case (tag, p) =>
      refCounts(tag, p).map { counts =>
        idsDf.join(counts, Seq("doc_id"), "left")
          .select(col("doc_id"), lit(tag).as("family"),
            coalesce(col("n"), lit(0L)).as("live_refs"))
      }
    }
    require(per.nonEmpty,
      "certificate needs at least one row-traceable family in targets")
    per.reduce(_ unionByName _)
  }
}
