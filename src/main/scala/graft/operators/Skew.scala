package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY §2.2 P4 / §2.5 A3 — the reference's
  * manual random-salt two-phase PV count, PageView.java:73-88).
  *
  * For plain `count`/`sum`, Spark's partial aggregation already does
  * map-side combining, so the reference's salting is unnecessary — that
  * path is [[Windowed.pageViews]]. Salting still earns its keep when the
  * per-key state is NOT map-side-combinable cheaply (e.g. exact
  * `collect_set`-based distinct on a hot key) or for skewed joins that AQE
  * doesn't catch. These helpers make the two-phase plan explicit and
  * deterministic (hash-based salt, not the reference's `Random`).
  */
object Skew {

  /** Deterministic salt 0..buckets-1 derived from arbitrary columns (the
    * reference used Random.nextInt(10); hash keeps replays identical).
    */
  def saltOf(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Two-phase salted distinct count per key: phase 1 aggregates distinct
    * sets per (key, salt) — spreading one hot key over `buckets` reducers —
    * phase 2 merges the per-salt partial distincts. Exact, unlike HLL.
    *
    * 100 TB note: the phase-1 shuffle carries (key, salt)-partitioned
    * traffic, so a key with 10^9 rows lands on `buckets` reducers instead
    * of one; phase 2 only merges `buckets` small sets per key.
    */
  def saltedDistinctCount(
      df: DataFrame,
      keyCols: Seq[Column],
      distinctCol: Column,
      buckets: Int = 32,
  ): DataFrame = {
    val phase1 = df
      .withColumn("__salt", saltOf(buckets, distinctCol))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(countDistinct(distinctCol).as("__partial"))
    // distinct values hash to exactly one salt bucket, so per-salt distinct
    // counts are disjoint and their SUM is the exact global distinct count
    phase1
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as("distinct_count"))
  }

  /** Salted join for a skewed left key: the left side gets a deterministic
    * salt hashed from its FULL row content (not
    * `monotonically_increasing_id`, which varies with partitioning and
    * would make reruns non-reproducible), the right side is exploded
    * `buckets`× so every (key, salt) pair finds its match. Rows that are
    * bit-identical across all columns land in the same bucket — salting
    * spreads *distinct* hot-key rows, which is the case that matters (a
    * hot key whose rows are all identical collapses under any
    * content-derived salt; pre-aggregate those instead). Use when AQE
    * skew-join can't kick in (e.g. the skew is in a stream-static join).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      buckets: Int = 8,
  ): DataFrame = {
    // hash() rejects MapType columns (no canonical entry order), so salt
    // from every hash-supported column; a schema whose rows differ only in
    // map columns degrades to per-key salting (documented above)
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val hashable = left.schema.fields
      .filterNot(f => hasMap(f.dataType))
      .map(f => col(f.name))
    // a left side with ONLY map-typed columns can't derive a row-content
    // salt at all (hash() rejects MapType): salting on the key alone would
    // put every hot-key row in one bucket — silently defeating the
    // function — so refuse loudly instead
    require(
      hashable.nonEmpty,
      "saltedJoin needs at least one non-map column on the left side to derive a row-content " +
        "salt (hash() does not support MapType); project a hashable column first")
    val saltedLeft = left.withColumn("__salt", saltOf(buckets, hashable.toSeq: _*))
    val explodedRight = right.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft
      .join(explodedRight,
        saltedLeft(keyCol) === explodedRight(keyCol) &&
          saltedLeft("__salt") === explodedRight("__salt"))
      .drop("__salt")
  }
}
