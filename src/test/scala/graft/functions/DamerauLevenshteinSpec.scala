package graft.functions

import graft.SparkSpec

/** The Damerau-Levenshtein kernel and its codegen'd expression: DuckDB-probed
  * golden values (the catalog's t_entity_typos hash-gates the full pair set;
  * these pin the tricky algorithmic corners), SQL-surface round trip, and
  * unrestricted-vs-OSA discrimination.
  */
class DamerauLevenshteinSpec extends SparkSpec {

  test("kernel matches DuckDB-probed golden values") {
    val cases = Seq(
      ("CA", "ABC", 2), // UNRESTRICTED DL (OSA would say 3)
      ("ab", "ba", 1),
      ("abcd", "acbd", 1),
      ("kitten", "sitting", 3),
      ("", "abc", 3),
      ("abc", "", 3),
      ("abc", "abc", 0),
      ("xy ab", "xy ba", 1),
      ("steel widget", "steel wdiget", 1), // the human-typo motivation
      ("steel widget", "steel midget", 1),
    )
    cases.foreach { case (a, b, d) =>
      assert(DamerauLevenshtein.distance(a, b) === d, s"($a, $b)")
      assert(DamerauLevenshtein.distance(b, a) === d, s"symmetric ($b, $a)")
    }
  }

  test("dl_distance evaluates through SQL and whole-stage codegen") {
    GraftFunctions.registerDlDistance(spark)
    import spark.implicits._
    val df = Seq(("ab", "ba"), ("CA", "ABC"), ("same", "same"))
      .toDF("a", "b")
      .selectExpr("dl_distance(a, b) AS d")
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(1, 2, 0))
    // transposition beats plain levenshtein where it should
    val cmp = spark.sql(
      "SELECT dl_distance('wdiget', 'widget'), levenshtein('wdiget', 'widget')").first()
    assert(cmp.getInt(0) === 1 && cmp.getInt(1) === 2)
  }
}
