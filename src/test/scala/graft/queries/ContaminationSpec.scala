package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Operator contracts for the round-9 curation/dedup additions beyond the
  * DuckDB hash-match: the eval-contamination check (`t_contamination`) and
  * paragraph-level exact dedup (`t_dedup_para`).
  */
class ContaminationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("t_contamination covers every non-train doc exactly once") {
    val rows = Catalog.queries("t_contamination")(spark, sf).collect()
    val evalIds = Catalog.queries("t_split_assign")(spark, sf)
      .filter(col("split") =!= "train").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet === evalIds,
      "one row per val/test document — absent rows would read as 'clean'")
    assert(rows.map(_.getAs[Long]("doc_id")).length === evalIds.size, "no duplicate rows")
    rows.foreach { r =>
      assert(Set("val", "test").contains(r.getAs[String]("split")))
      assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_sh"),
        "overlap can never exceed the doc's own shingle count")
    }
  }

  test("t_contamination's 80% threshold separates leaked near-dups from vocab noise") {
    val rows = Catalog.queries("t_contamination")(spark, sf)
      .select(col("doc_id"), col("overlap_pct"), col("contaminated")).collect()
    val (hot, cold) = rows.partition(_.getAs[Boolean]("contaminated"))
    // the synthetic corpus shares a small vocabulary, so EVERY eval doc has
    // substantial background overlap — the threshold must flag only the
    // genuinely leaked (near-)duplicates, not the whole eval set
    assert(hot.nonEmpty, "the corpus contains cross-split near-dups; some must be flagged")
    assert(cold.nonEmpty, "flagging every eval doc means the threshold is vocabulary noise")
    assert(cold.length > hot.length, "contamination should be the exception, not the rule")
    hot.foreach(r => assert(r.getAs[Long]("overlap_pct") >= 80))
    // and the flag is consistent with the published pct (pct 80 == 4/5 exactly
    // only when the division is exact, so compare through the same floor)
    cold.foreach(r => assert(r.getAs[Long]("overlap_pct") < 80))
  }

  test("t_contamination flags the cross-split exact duplicates") {
    // exact duplicate pairs straddling the split boundary are contamination
    // by construction: the eval copy's shingle set is fully inside train's
    val dup = Catalog.queries("t_dedup_exact")(spark, sf)
      .select(col("doc_id"), col("text_hash")).collect()
      .groupBy(_.getString(1)).values.filter(_.length > 1).toSeq
    val split = Catalog.queries("t_split_assign")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val leakedEvalIds = dup.flatMap { grp =>
      val ids = grp.map(_.getLong(0))
      if (ids.exists(split(_) == "train")) ids.filter(split(_) != "train") else Nil
    }.toSet
    if (leakedEvalIds.nonEmpty) {
      val flagged = Catalog.queries("t_contamination")(spark, sf)
        .filter(col("contaminated")).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      leakedEvalIds.foreach(id =>
        assert(flagged.contains(id), s"doc $id is an exact train-side duplicate, must be flagged"))
    }
  }

  test("t_dedup_para keeps first occurrences and reassembles in document order") {
    val rows = Catalog.queries("t_dedup_para")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === docs.size, "every (non-empty) document gets a row")
    var removedSomewhere = 0
    rows.foreach { r =>
      val (id, np, nk, clean) =
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_paras"),
          r.getAs[Long]("n_kept"), r.getAs[String]("clean_text"))
      assert(nk <= np && nk >= 0)
      if (nk < np) removedSomewhere += 1
      // kept-paragraph reassembly is a subsequence of the original text's
      // 25-token blocks, in order
      val toks = docs(id).split(" ").filter(_.nonEmpty)
      val orig = toks.grouped(25).map(_.mkString(" ")).toSeq
      val kept = if (clean.isEmpty) Seq.empty else {
        // paragraphs are whole blocks, so splitting the reassembly back on
        // the original block boundaries must reproduce a subsequence
        var rest = clean
        orig.flatMap { p =>
          if (rest == p) { rest = ""; Some(p) }
          else if (rest.startsWith(p + " ")) { rest = rest.drop(p.length + 1); Some(p) }
          else None
        }
      }
      assert(kept.length === nk, s"doc $id: reassembly is not an in-order block subsequence")
    }
    assert(removedSomewhere > 0,
      "the corpus contains cross-document repeated blocks; some doc must shrink")
  }

  test("t_dedup_para catches cross-document boilerplate that doc-level dedup misses") {
    // take documents that are NOT exact duplicates (doc-level keepers) yet
    // still lost a paragraph — the residue the operator exists for
    val docKeepers = Catalog.queries("t_dedup_exact")(spark, sf)
      .filter(!col("is_duplicate")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val shrunk = Catalog.queries("t_dedup_para")(spark, sf)
      .filter(col("n_kept") < col("n_paras")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert((shrunk & docKeepers).nonEmpty,
      "some doc-level KEEPER must still lose a repeated block — else the op adds nothing")
  }
}
