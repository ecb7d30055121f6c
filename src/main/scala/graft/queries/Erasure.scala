package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IndexManifest

/** One-call right-to-be-forgotten across the stored-artifact fleet.
  *
  * Ten index families persist derived state about documents and
  * users; each already has its own crash-atomic forget path (tombstone
  * or negated-count epoch + same-epoch stats give-back — see
  * IMPLEMENTATION.md's forget rows). This orchestrator is the missing
  * deployment surface: an erasure request arrives as "forget these
  * docs" / "forget these users", not as eight separate index calls.
  *
  * Scope by grain:
  *   - DOC grain  — postings (BM25), LSH (near-dup), shingle-df
  *     (novelty), SCD2 (dimension history), IVF-PQ, BQ and SQ8
  *     (vector search; `vec_id` = `doc_id` in this corpus' contract).
  *   - USER grain — co-occurrence (self-attributing: the stored `ui`
  *     rows are the user's data), the transition graph (aggregated:
  *     erasure needs the user's event slice from the source log), and
  *     the zone-mapped event TABLE itself (tombstone epoch; physical
  *     on compaction — see LayoutOps.forgetEventTableUsers for the
  *     retention semantics).
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
  *
  * [[forgetDocsDurable]]/[[forgetUsersDurable]] remove the last
  * caller-held state: request + snapshot persist as a fleet-level
  * INTENT under a root path before any index is touched, and
  * [[resumeForgetDocs]]/[[resumeForgetUsers]] replay from disk alone.
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
      bq: Option[String] = None,
      sq8: Option[String] = None) {

    /** (family-tag, path) in the fixed processing order — the resume
      * protocol's ground truth.
      */
    def ordered: Seq[(String, String)] =
      Seq("postings" -> postings, "lsh" -> lsh, "shingle" -> shingle,
        "scd2" -> scd2, "ivfpq" -> ivfPq, "bq" -> bq, "sq8" -> sq8)
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
        bq = keep("bq", bq),
        sq8 = keep("sq8", sq8))
    }
  }

  /** The user-grain stored artifacts. `transition` erasure additionally
    * needs the users' event slice ([[forgetUsers]]' `userEvs`);
    * `table` is the zone-mapped event table itself — the SOURCE LOG
    * must not be the one place erased users survive.
    */
  final case class UserTargets(
      cooccur: Option[String] = None,
      transition: Option[String] = None,
      table: Option[String] = None) {

    def ordered: Seq[(String, String)] =
      Seq("cooccur" -> cooccur, "transition" -> transition, "table" -> table)
        .collect { case (tag, Some(p)) => tag -> p }

    def remaining(snapshot: Map[String, Long]): UserTargets = {
      def keep(tag: String, p: Option[String]): Option[String] =
        p.filter(path => snapshot.get(tag).forall(pre =>
          IndexManifest.committedEpoch(path, fmtOf(tag)) == pre))
      UserTargets(
        cooccur = keep("cooccur", cooccur),
        transition = keep("transition", transition),
        table = keep("table", table))
    }
  }

  private def fmtOf(tag: String): IndexManifest.Format = tag match {
    case "postings"   => IndexManifest.Postings
    case "lsh"        => IndexManifest.Lsh
    case "shingle"    => IndexManifest.Shingle
    case "scd2"       => IndexManifest.Scd2
    case "ivfpq"      => IndexManifest.IvfPq
    case "bq"         => IndexManifest.Bq
    case "sq8"        => IndexManifest.Sq8
    case "cooccur"    => IndexManifest.Cooccur
    case "transition" => IndexManifest.Transition
    case "table"      => IndexManifest.Layout
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
  def forgetDocs(docs: DataFrame, targets: DocTargets): Unit =
    runDocFamilies(docs, targets, failAfter = Int.MaxValue)

  /** The fan-out loop, with a planted-crash hook for the drills:
    * `failAfter = k` throws after k families committed.
    */
  private def runDocFamilies(docs: DataFrame, targets: DocTargets,
      failAfter: Int): Unit = {
    // one materialization feeds up to seven fan-out reads
    val d = docs.localCheckpoint(true)
    val ids = d.select(col("doc_id"))
    val vecIds = d.select(col("doc_id").as("vec_id"))
    targets.ordered.zipWithIndex.foreach { case ((tag, p), i) =>
      if (i >= failAfter)
        throw new RuntimeException(s"planted crash before family '$tag'")
      tag match {
        case "postings" => SearchOps.deleteFromPostingsIndex(ids, p)
        case "lsh"      => TextOps.deleteFromLshIndex(ids, p)
        case "shingle"  =>
          TextOps.forgetShingleDocs(d.select(col("doc_id"), col("text")), p)
        case "scd2"     => TextOps.purgeScd2Docs(ids, p)
        case "ivfpq"    => VectorOps.deleteFromIvfPqIndex(vecIds, p)
        case "bq"       => VectorOps.deleteFromBqIndex(vecIds, p)
        case "sq8"      => VectorOps.deleteFromSq8Index(vecIds, p)
      }
    }
  }

  /** Erase users from every deployed user-grain artifact. `users` has
    * column `user_id`; `userEvs` is the forgotten users' complete event
    * slice (with `item`, `ts_sec`, `event_id`), required exactly when
    * `transition` is targeted — the transition graph stores no per-user
    * attribution to erase from.
    */
  def forgetUsers(users: DataFrame, targets: UserTargets,
      userEvs: Option[DataFrame] = None): Unit =
    runUserFamilies(users, targets, userEvs, failAfter = Int.MaxValue)

  private def runUserFamilies(users: DataFrame, targets: UserTargets,
      userEvs: Option[DataFrame], failAfter: Int): Unit = {
    require(targets.transition.isEmpty || userEvs.nonEmpty,
      "transition-graph erasure needs the users' event slice (userEvs)")
    val u = users.select(col("user_id")).localCheckpoint(true)
    targets.ordered.zipWithIndex.foreach { case ((tag, p), i) =>
      if (i >= failAfter)
        throw new RuntimeException(s"planted crash before family '$tag'")
      tag match {
        case "cooccur"    => GraphOps.forgetCooccurUsers(u, p)
        case "transition" =>
          GraphOps.forgetTransitionUsers(
            userEvs.get.join(u, Seq("user_id"), "left_semi"), p)
        case "table"      => LayoutOps.forgetEventTableUsers(u, p)
      }
    }
  }

  // ---------------------------------------------------------------------
  // DURABLE erasure — the fleet-level INTENT LEDGER. The plain
  // forgetDocs/forgetUsers resume protocol depends on a caller-held
  // epoch snapshot: if the CALLER crashes without persisting it, resume
  // is ambiguous. The durable entry points close that hole by persisting
  // the request AND the pre-call snapshot under a fleet root BEFORE any
  // index is touched, so a crashed erasure resumes from DISK alone:
  //
  //   <intentRoot>/request/        the request rows (parquet)
  //   <intentRoot>/user_events/    the users' event slice (user grain,
  //                                when the transition graph is targeted)
  //   <intentRoot>/_intent.ledger  grain + (family, pre-epoch, path)
  //                                rows — written LAST via tmp+rename,
  //                                so its presence implies the payload
  //                                is complete
  //
  // Completion renames the intent to `_completed.ledger` (the audit
  // trail a certificate run pairs with). Exactly one in-flight intent
  // per root: starting a new durable erasure over a pending intent
  // fails fast instead of interleaving two requests' snapshots. The
  // out-of-band-writer caveat is unchanged from the class doc: "epoch
  // advanced" reads as "this family committed", so the fleet must have
  // no other writers between crash and resume.
  // ---------------------------------------------------------------------

  import graft.sources.LedgerIO

  private def intentFile(root: String) = LedgerIO.child(root, "_intent.ledger")

  private def writeIntent(root: String, grain: String,
      rows: Seq[(String, Long, String)]): Unit = {
    val body = (s"grain=$grain" +: rows.map { case (tag, e, p) => s"$tag\t$e\t$p" })
      .mkString("", "\n", "\n")
    LedgerIO.writeAtomic(intentFile(root), "._intent.tmp", body)
  }

  private def readIntent(root: String, expectGrain: String): Seq[(String, Long, String)] = {
    val text = LedgerIO.readIfExists(intentFile(root)).getOrElse(
      throw new IllegalArgumentException(
        s"requirement failed: no pending erasure intent at $root - nothing to resume"))
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    require(lines.headOption.contains(s"grain=$expectGrain"),
      s"intent at $root is '${lines.headOption.getOrElse("")}', expected grain=$expectGrain")
    lines.tail.map { ln =>
      val Array(tag, e, p) = ln.split('\t')
      (tag, e.toLong, p)
    }
  }

  private def completeIntent(root: String): Unit =
    LedgerIO.renameOverwrite(intentFile(root),
      LedgerIO.child(root, "_completed.ledger"))

  private def docTargetsOf(rows: Seq[(String, Long, String)]): DocTargets = {
    val m = rows.map { case (tag, _, p) => tag -> p }.toMap
    DocTargets(postings = m.get("postings"), lsh = m.get("lsh"),
      shingle = m.get("shingle"), scd2 = m.get("scd2"),
      ivfPq = m.get("ivfpq"), bq = m.get("bq"), sq8 = m.get("sq8"))
  }

  /** Reconstruct the user-grain targets from persisted intent rows —
    * the single place the tag→field mapping lives, so a future family
    * can't be silently dropped on resume (the round-16 defect: resume
    * rebuilt UserTargets inline and omitted `table`, so a crash before
    * the event-table tombstone resumed to a false "completed").
    */
  private def userTargetsOf(rows: Seq[(String, Long, String)]): UserTargets = {
    val m = rows.map { case (tag, _, p) => tag -> p }.toMap
    UserTargets(cooccur = m.get("cooccur"), transition = m.get("transition"),
      table = m.get("table"))
  }

  /** [[forgetDocs]] with the intent persisted first — crash-resumable
    * from disk alone via [[resumeForgetDocs]]. `docs` needs the same
    * columns as forgetDocs (`doc_id`, plus `text` when shingle is
    * targeted); the PERSISTED copy is what both the initial run and any
    * resume process, so they see identical rows by construction.
    */
  def forgetDocsDurable(docs: DataFrame, targets: DocTargets,
      intentRoot: String): Unit =
    forgetDocsDurable(docs, targets, intentRoot, failAfter = Int.MaxValue)

  private[queries] def forgetDocsDurable(docs: DataFrame, targets: DocTargets,
      intentRoot: String, failAfter: Int): Unit = {
    require(!LedgerIO.exists(intentFile(intentRoot)),
      s"pending erasure intent at $intentRoot - resumeForgetDocs first " +
        "(one in-flight erasure per fleet root)")
    val s = docs.sparkSession
    docs.write.mode("overwrite").parquet(s"$intentRoot/request")
    val snap = committedEpochs(targets.ordered)
    writeIntent(intentRoot, "doc",
      targets.ordered.map { case (tag, p) => (tag, snap(tag), p) })
    runDocFamilies(s.read.parquet(s"$intentRoot/request"), targets, failAfter)
    completeIntent(intentRoot)
  }

  /** Resume a crashed [[forgetDocsDurable]] from DISK alone: the
    * request, targets, and pre-call snapshot all come from the intent
    * root; families whose epoch advanced past the persisted snapshot
    * are already done and are skipped (never double-subtracted).
    */
  def resumeForgetDocs(s: SparkSession, intentRoot: String): Unit = {
    val rows = readIntent(intentRoot, "doc")
    val snapshot = rows.map { case (tag, e, _) => tag -> e }.toMap
    val remaining = docTargetsOf(rows).remaining(snapshot)
    if (remaining.ordered.nonEmpty)
      runDocFamilies(s.read.parquet(s"$intentRoot/request"), remaining,
        failAfter = Int.MaxValue)
    completeIntent(intentRoot)
  }

  /** [[forgetUsers]], durable. `userEvs` (required when transition is
    * targeted) is persisted alongside the request so resume needs no
    * caller-held frame.
    */
  def forgetUsersDurable(users: DataFrame, targets: UserTargets,
      userEvs: Option[DataFrame], intentRoot: String): Unit =
    forgetUsersDurable(users, targets, userEvs, intentRoot, failAfter = Int.MaxValue)

  private[queries] def forgetUsersDurable(users: DataFrame, targets: UserTargets,
      userEvs: Option[DataFrame], intentRoot: String, failAfter: Int): Unit = {
    require(!LedgerIO.exists(intentFile(intentRoot)),
      s"pending erasure intent at $intentRoot - resumeForgetUsers first " +
        "(one in-flight erasure per fleet root)")
    require(targets.transition.isEmpty || userEvs.nonEmpty,
      "transition-graph erasure needs the users' event slice (userEvs)")
    val s = users.sparkSession
    users.select(col("user_id")).write.mode("overwrite")
      .parquet(s"$intentRoot/request")
    userEvs.foreach(_.write.mode("overwrite").parquet(s"$intentRoot/user_events"))
    val snap = committedEpochs(targets.ordered)
    writeIntent(intentRoot, "user",
      targets.ordered.map { case (tag, p) => (tag, snap(tag), p) })
    runUserFamilies(s.read.parquet(s"$intentRoot/request"), targets,
      userEvs.map(_ => s.read.parquet(s"$intentRoot/user_events")), failAfter)
    completeIntent(intentRoot)
  }

  /** Resume a crashed [[forgetUsersDurable]] from disk alone. */
  def resumeForgetUsers(s: SparkSession, intentRoot: String): Unit = {
    val rows = readIntent(intentRoot, "user")
    val snapshot = rows.map { case (tag, e, _) => tag -> e }.toMap
    val remaining = userTargetsOf(rows).remaining(snapshot)
    if (remaining.ordered.nonEmpty) {
      val evs =
        if (remaining.transition.nonEmpty)
          Some(s.read.parquet(s"$intentRoot/user_events"))
        else None
      runUserFamilies(s.read.parquet(s"$intentRoot/request"), remaining, evs,
        failAfter = Int.MaxValue)
    }
    completeIntent(intentRoot)
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
    * per band), IVF-PQ (one row per PQ subspace), BQ (one packed row),
    * SQ8 (one codes row).
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
      case "sq8"      => Some(VectorOps.storedSq8Codes(s, path)
        .select(col("vec_id").as("doc_id")))
      case _          => None // shingle: count-aggregated; scd2: see scaladoc
    }).map { rows =>
      // the audit-id panel is bounded (one request's ids) — pin the
      // broadcast on both legs, the fleet's bounded-panel convention,
      // so the per-family scan never shuffles on a 100x table
      rows.join(broadcast(idsDf), Seq("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    }
    val per = targets.ordered.flatMap { case (tag, p) =>
      refCounts(tag, p).map { counts =>
        idsDf.join(broadcast(counts), Seq("doc_id"), "left")
          .select(col("doc_id"), lit(tag).as("family"),
            coalesce(col("n"), lit(0L)).as("live_refs"))
      }
    }
    require(per.nonEmpty,
      "certificate needs at least one row-traceable family in targets")
    per.reduce(_ unionByName _)
  }

  /** USER-GRAIN erasure certificate — the grain GDPR requests actually
    * arrive at. For each audited user and each row-traceable deployed
    * user family, the count of live rows still attributing to them,
    * through exactly the resolved views readers serve from:
    *
    *   - cooccur — the stored `ui` rows ARE the user's data
    *     (tombstone-resolved, [[GraphOps.resolvedUi]]);
    *   - table — the zone-mapped event table's resolved rows
    *     ([[LayoutOps.readEventTable]]): the source log must certify 0
    *     too, or the fleet certificate is theater.
    *
    * The transition graph is NOT certifiable this way by design — it
    * stores aggregated edge counts with no per-user attribution (the
    * shingle index's situation at doc grain); its erasure is certified
    * by the epoch ledger of the subtraction fold. Same audit
    * discipline as [[certificate]]: include non-erased controls, whose
    * expected non-zero counts prove the scan actually looks.
    */
  def certificateUsers(s: SparkSession, targets: UserTargets, ids: DataFrame): DataFrame = {
    val idsDf = ids.select(col("user_id").cast("long").as("user_id"))
      .distinct().localCheckpoint(true)
    def refCounts(tag: String, path: String): Option[DataFrame] = (tag match {
      case "cooccur" => Some(GraphOps.resolvedUi(s, path).select(col("user_id")))
      case "table"   => Some(LayoutOps.readEventTable(s, path).select(col("user_id")))
      case _         => None // transition: count-aggregated; see scaladoc
    }).map { rows =>
      // bounded-panel broadcast pinned on both legs (see certificate)
      rows.join(broadcast(idsDf), Seq("user_id"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    }
    val per = targets.ordered.flatMap { case (tag, p) =>
      refCounts(tag, p).map { counts =>
        idsDf.join(broadcast(counts), Seq("user_id"), "left")
          .select(col("user_id"), lit(tag).as("family"),
            coalesce(col("n"), lit(0L)).as("live_refs"))
      }
    }
    require(per.nonEmpty,
      "certificateUsers needs at least one row-traceable user family in targets")
    per.reduce(_ unionByName _)
  }
}
