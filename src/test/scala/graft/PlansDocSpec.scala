package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.queries.Catalog

/** Drift check for PLANS.md: for every published query
  * ([[Catalog.plannedNames]]) the operator tree of the LIVE formatted
  * plan must match the tree recorded in the doc. Catches the
  * round-5 failure mode where an operator rewrite (MapGroups →
  * MapPartitions) landed without the plan-audit artifact being
  * regenerated. Fix a failure by running `tools/regen_plans.sh` and
  * committing the refreshed PLANS.md.
  *
  * Comparison is on operator NAMES in tree order (expression ids, node
  * numbers, and sizes are run-dependent noise; the operator sequence is
  * the plan shape the round-over-round audit reads).
  */
class PlansDocSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Operator tokens of the first tree block after `== Physical Plan ==`. */
  private def opTokens(lines: Iterator[String]): Seq[String] = {
    val afterHeader = lines.dropWhile(!_.contains("== Physical Plan ==")).drop(1)
    afterHeader
      .takeWhile(_.trim.nonEmpty)
      .flatMap { l =>
        val t = l.dropWhile(c => c == ' ' || c == '+' || c == '-' || c == ':' || c == '*')
        "^[A-Za-z][A-Za-z0-9_]*".r.findFirstIn(t)
      }
      .toSeq
  }

  private lazy val docSections: Map[String, Seq[String]] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("PLANS.md")), "UTF-8")
    text
      .split("(?m)^## ")
      .iterator
      .drop(1)
      .map { sec =>
        val name = sec.linesIterator.next().trim
        name -> opTokens(sec.linesIterator)
      }
      .toMap
  }

  test("PLANS.md operator trees match the live plans for every published query") {
    val missing = Catalog.plannedNames.filterNot(docSections.contains)
    assert(missing.isEmpty,
      s"PLANS.md lacks sections for $missing — run tools/regen_plans.sh")
    Catalog.plannedNames.foreach { name =>
      val live = opTokens(
        Catalog.queries(name)(spark, sf)
          .queryExecution
          .explainString(ExplainMode.fromString("formatted"))
          .linesIterator)
      assert(live.nonEmpty, s"$name: live plan parse produced no operators")
      assert(docSections(name) == live,
        s"$name: PLANS.md is stale (doc=${docSections(name)} live=$live) — " +
          "run tools/regen_plans.sh and commit the refreshed PLANS.md")
    }
  }

  test("PLANS.md documents no queries that left the published set") {
    val stale = docSections.keySet -- Catalog.plannedNames
    assert(stale.isEmpty,
      s"PLANS.md carries sections for $stale — run tools/regen_plans.sh")
  }
}
