package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational / OLAP query pack over the TPC-H-ish star schema.
  *
  * These exercise the core engine surface the reference's jobs imply —
  * scan + pushed filter, projection pruning, hash aggregation (partial→final),
  * broadcast vs shuffle joins, semi joins, ranking window functions, and
  * deterministic top-k — in the shapes Catalyst optimizes best.
  *
  * Monetary aggregates fold `floor(x * 100)` cents into BIGINT before
  * summing: per-row IEEE double math is bit-identical across engines, and
  * integer sums are order-independent, so results hash-match the DuckDB
  * oracle exactly (see [[Q]] docs).
  *
  * Scale notes (100 TB): every query here is a scan→(broadcast join)*→
  * partial agg→shuffle→final agg pipeline. Dimension joins use explicit
  * `broadcast()`; fact-fact joins shuffle on the join key and AQE handles
  * skew. No driver-side collection anywhere.
  */
object Relational {

  private val centsL = (c: org.apache.spark.sql.Column) => floor(c * 100)

  /** TPC-H Q1-shaped pricing summary — partial-agg-friendly wide aggregation.
    * Reference analog: the cloned incremental count/sum AggregateFunctions
    * (SURVEY §2.5 A1/A2, e.g. HotItemsAnalysis/.../HotItems.java:93-113).
    */
  val q1PricingSummary = Q(
    "q1_pricing_summary",
    (s, d) => {
      import s.implicits._
      Tables
        .lineitem(s, d)
        .filter($"l_shipdate" <= lit("2000-12-31").cast("timestamp_ntz"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          // l_quantity is integral-valued double (1..50); summing as BIGINT
          // is exact and order-independent, unlike a raw double sum.
          sum($"l_quantity".cast("long")).as("sum_qty"),
          sum(centsL($"l_extendedprice")).as("sum_base_cents"),
          sum(centsL($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_cents"),
          sum(centsL($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")))
            .as("sum_charge_cents"),
          count(lit(1)).as("count_order"),
        )
        .withColumn("avg_qty", $"sum_qty" / $"count_order")
        .withColumn("avg_price", $"sum_base_cents" / lit(100.0) / $"count_order")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
             COUNT(*) AS count_order,
             SUM(CAST(l_quantity AS BIGINT)) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / COUNT(*) AS avg_price
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-31'
      GROUP BY l_returnflag, l_linestatus
    """.stripMargin.trim),
    bench = true,
  )

  /** TPC-H Q3-shaped shipping priority: two shuffles (orders⋈lineitem on
    * orderkey, then agg) + one broadcast (filtered customer dim), then a
    * deterministic top-10. The broadcast keeps the big fact-fact join as the
    * only shuffle that scales with data volume.
    */
  val q3ShippingPriority = Q(
    "q3_shipping_priority",
    (s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val o = Tables.orders(s, d).filter($"o_orderdate" < lit("1999-01-01").cast("timestamp_ntz"))
      val l = Tables.lineitem(s, d).filter($"l_shipdate" > lit("1999-01-01").cast("timestamp_ntz"))
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"))
        .agg(sum(centsL($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_cents"))
        .orderBy($"revenue_cents".desc, $"l_orderkey")
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1999-01-01'
        AND l_shipdate  > TIMESTAMP '1999-01-01'
      GROUP BY l_orderkey, orderdate
      ORDER BY revenue_cents DESC, l_orderkey
      LIMIT 10
    """.stripMargin.trim),
    bench = true,
  )

  /** TPC-H Q5-shaped revenue by nation: snowflake of broadcast dims around
    * the lineitem⋈orders shuffle join.
    */
  val q5NationRevenue = Q(
    "q5_nation_revenue",
    (s, d) => {
      import s.implicits._
      val dims = Tables
        .customer(s, d)
        .join(Tables.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .join(Tables.region(s, d).filter($"r_name".isin("ASIA", "EUROPE")),
              $"n_regionkey" === $"r_regionkey")
        .select($"c_custkey", $"n_name")
      val o = Tables
        .orders(s, d)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp_ntz"))
      Tables
        .lineitem(s, d)
        .join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(dims), $"o_custkey" === $"c_custkey")
        .groupBy($"n_name")
        .agg(
          sum(centsL($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_cents"),
          count(lit(1)).as("n_items"),
        )
    },
    Some("""
      SELECT n_name,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
             COUNT(*) AS n_items
      FROM lineitem, orders, customer, nation, region
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name IN ('ASIA', 'EUROPE')
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name
    """.stripMargin.trim),
    bench = true,
  )

  /** Ranking window function (reference T1/T3 Top-N shape on relational
    * data): top-3 customers by order revenue within each nation.
    * ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ...) with a deterministic
    * tiebreak — the same plan shape as HotItemsWithSql.java:73-76.
    */
  val qTopCustomersPerNation = Q(
    "q_top_customers_per_nation",
    (s, d) => {
      import s.implicits._
      val rev = Tables
        .orders(s, d)
        .groupBy($"o_custkey")
        .agg(sum(centsL($"o_totalprice")).as("rev_cents"))
      val w = Window.partitionBy($"n_name").orderBy($"rev_cents".desc, $"o_custkey")
      rev
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .select($"n_name", $"o_custkey", $"rev_cents")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= 3)
    },
    Some("""
      WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders GROUP BY o_custkey)
      SELECT n_name, o_custkey, rev_cents, rnk FROM (
        SELECT n_name, o_custkey, rev_cents,
               ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY rev_cents DESC, o_custkey) AS rnk
        FROM rev, customer, nation
        WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey)
      WHERE rnk <= 3
    """.stripMargin.trim),
  )

  /** Semi-join (EXISTS) shape — orders having a lineitem shipped more than
    * 60 days after the order date, counted per priority.
    */
  val qOrderPriorityCount = Q(
    "q_order_priority_count",
    (s, d) => {
      import s.implicits._
      val late = Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate")
      Tables
        .orders(s, d)
        .join(
          late,
          $"o_orderkey" === $"l_orderkey" &&
            $"l_shipdate" > ($"o_orderdate" + expr("INTERVAL 60 DAYS")),
          "left_semi",
        )
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
    """.stripMargin.trim),
  )

  /** Anti-join (NOT EXISTS): customers with no orders in 1999+. */
  val qDormantCustomers = Q(
    "q_dormant_customers",
    (s, d) => {
      import s.implicits._
      val recent = Tables
        .orders(s, d)
        .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp_ntz"))
        .select($"o_custkey")
      Tables
        .customer(s, d)
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_dormant"))
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_dormant
      FROM customer
      WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY c_mktsegment
    """.stripMargin.trim),
  )

  /** Multi-way dim join + grouped stats over part/supplier (small-table
    * broadcast shapes).
    */
  val qPartSupplierStats = Q(
    "q_part_supplier_stats",
    (s, d) => {
      import s.implicits._
      Tables
        .lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .groupBy($"p_brand", $"s_name")
        .agg(
          sum($"l_quantity".cast("long")).as("sum_qty"),
          count(lit(1)).as("n_lines"),
          countDistinct($"l_orderkey").as("n_orders"),
        )
    },
    Some("""
      SELECT p_brand, s_name, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, COUNT(*) AS n_lines,
             COUNT(DISTINCT l_orderkey) AS n_orders
      FROM lineitem, part, supplier
      WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      GROUP BY p_brand, s_name
    """.stripMargin.trim),
  )

  /** TPC-H Q6-shaped forecast revenue: the purest pushdown showcase — every
    * predicate (ship-date range, discount band, quantity cap) reaches the
    * parquet scan, the projection reads 4 of 11 columns, and the whole
    * query is one partial→final aggregation with no shuffle of data rows
    * (one row per partition crosses the wire).
    *
    * Determinism: revenue is summed as an exact integer — cents(price) ×
    * hundredths(discount). Discount hundredths use round(), not a cast:
    * `0.06 * 100` is `5.999…` in IEEE, which Spark's cast TRUNCATES to 5
    * while DuckDB's cast rounds to 6; `round()` agrees on both engines.
    */
  val q6ForecastRevenue = Q(
    "q6_forecast_revenue",
    (s, d) => {
      import s.implicits._
      Tables
        .lineitem(s, d)
        .filter(
          $"l_shipdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
            $"l_shipdate" < lit("1997-01-01").cast("timestamp_ntz") &&
            $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(
          count(lit(1)).as("n_items"),
          sum(centsL($"l_extendedprice") * round($"l_discount" * 100).cast("long"))
            .as("revenue_c4"),
        )
    },
    Some("""
      SELECT COUNT(*) AS n_items,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                      * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_c4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """.stripMargin.trim),
  )

  // ---------------------------------------------------------------------
  // Column profiler — the data-quality pass a warehouse runs on ingest:
  // per numeric column, row/null/distinct counts and exact cents
  // min/max/sum, in ONE scan (the columns unpivot into (column, cents)
  // rows via a map explode, then a single keyed aggregation — not one
  // scan per column). Distinct counts are per (column, value) partials
  // first, so the exchange carries distinct values, not rows.
  // ---------------------------------------------------------------------
  private val profileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val qProfile = Q(
    "q_profile_lineitem",
    (s, d) => {
      import s.implicits._
      val mapEntries = profileCols.flatMap(c =>
        Seq(lit(c), floor(col(c) * 100).cast("long")))
      Tables.lineitem(s, d)
        .select(explode(map(mapEntries: _*)).as(Seq("column", "cents")))
        .groupBy($"column")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when($"cents".isNull, 1L).otherwise(0L)).as("n_null"),
          count_distinct($"cents").as("n_distinct"),
          min($"cents").as("min_cents"),
          max($"cents").as("max_cents"),
          sum($"cents").as("sum_cents"))
    },
    Some {
      val perCol = profileCols.map(c =>
        s"SELECT '$c' AS col, CAST(FLOOR($c * 100) AS BIGINT) AS cents FROM lineitem")
        .mkString(" UNION ALL ")
      s"""
      WITH u AS ($perCol)
      SELECT col AS "column",
             COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             COUNT(DISTINCT cents) AS n_distinct,
             MIN(cents) AS min_cents,
             MAX(cents) AS max_cents,
             CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM u GROUP BY 1
    """.stripMargin.trim
    },
  )

  // ---------------------------------------------------------------------
  // ROLLUP lattice — the multi-level subtotal shape (per (flag, status),
  // per flag, grand total) in ONE pass: Spark's Expand operator emits
  // each row once per grouping set BEFORE the partial aggregation, so
  // the exchange still carries one row per (grouping, key), never the
  // fact table; DuckDB's ROLLUP matches the NULL-marker convention
  // exactly. grouping_id disambiguates a real NULL key from a subtotal
  // marker (none exist in this data, but the column is the contract).
  // ---------------------------------------------------------------------
  val qRevenueRollup = Q(
    "q_revenue_rollup",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_returnflag", $"l_linestatus",
          centsL($"l_extendedprice").cast("long").as("cents"))
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_items"),
          sum($"cents").as("rev_cents"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """.stripMargin.trim),
  )

  // ---------------------------------------------------------------------
  // Customer revenue deciles per nation — NTILE coverage: deterministic
  // (revenue DESC, custkey tiebreak) so the bucket assignment — which
  // depends on row ORDER, not just values — is identical cross-engine.
  // Partitioned by nation, so no global-order funnel; a global decile
  // would use the histogram/two-phase form instead.
  // ---------------------------------------------------------------------
  val qCustomerDeciles = Q(
    "q_customer_deciles",
    (s, d) => {
      import s.implicits._
      val rev = Tables.orders(s, d)
        .select($"o_custkey", centsL($"o_totalprice").cast("long").as("cents"))
        .groupBy($"o_custkey").agg(sum($"cents").as("rev_cents"))
      val w = Window.partitionBy($"c_nationkey")
        .orderBy($"rev_cents".desc, $"c_custkey")
      Tables.customer(s, d)
        .join(rev, $"c_custkey" === $"o_custkey", "inner")
        .select($"c_custkey", $"c_nationkey", $"rev_cents")
        .withColumn("decile", ntile(10).over(w).cast("long"))
    },
    Some("""
      WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1)
      SELECT c_custkey, c_nationkey, rev_cents,
             CAST(NTILE(10) OVER (PARTITION BY c_nationkey
               ORDER BY rev_cents DESC, c_custkey) AS BIGINT) AS decile
      FROM customer JOIN rev ON c_custkey = o_custkey
    """.stripMargin.trim),
  )

  // ---------------------------------------------------------------------
  // Customers above their nation's average balance — the correlated
  // scalar-subquery shape, expressed as the aggregate-then-rejoin plan
  // Catalyst decorrelates to anyway: per-nation exact cents averages
  // (floor of an integer sum over a count — bit-portable) broadcast
  // back onto the customer scan. The oracle keeps the correlated
  // subquery form, pinning that both formulations agree.
  // ---------------------------------------------------------------------
  val qAboveNationAvg = Q(
    "q_above_nation_avg",
    (s, d) => {
      import s.implicits._
      val cust = Tables.customer(s, d)
        .select($"c_custkey", $"c_nationkey",
          centsL($"c_acctbal").cast("long").as("bal_cents"))
      val avgs = cust.groupBy($"c_nationkey")
        .agg(floor(sum($"bal_cents") * lit(1.0) / count(lit(1))).cast("long")
          .as("avg_cents"))
      cust.join(broadcast(avgs), "c_nationkey")
        .filter($"bal_cents" > $"avg_cents")
        .select($"c_custkey", $"c_nationkey", $"bal_cents", $"avg_cents")
    },
    Some("""
      WITH c AS (
        SELECT c_custkey, c_nationkey,
               CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer)
      SELECT c_custkey, c_nationkey, bal_cents,
             (SELECT CAST(FLOOR(SUM(bal_cents) * 1.0 / COUNT(*)) AS BIGINT)
              FROM c c2 WHERE c2.c_nationkey = c.c_nationkey) AS avg_cents
      FROM c
      WHERE bal_cents > (SELECT FLOOR(SUM(bal_cents) * 1.0 / COUNT(*))
                         FROM c c2 WHERE c2.c_nationkey = c.c_nationkey)
    """.stripMargin.trim),
  )

  // ---------------------------------------------------------------------
  // PIVOT — market segments as columns, one revenue column per segment
  // per nation. Spark's pivot with an EXPLICIT value list (an implicit
  // list would scan once extra to discover values — never acceptable at
  // 100 TB); the oracle states the same thing as conditional
  // aggregation, which is also exactly what Catalyst lowers pivot to.
  // ---------------------------------------------------------------------
  private val mktSegments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  val qSegmentPivot = Q(
    "q_segment_pivot",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_nationkey", $"c_mktsegment",
          centsL($"o_totalprice").cast("long").as("cents"))
        .groupBy($"c_nationkey")
        .pivot("c_mktsegment", mktSegments)
        .agg(sum($"cents"))
        // the zero-fill must sit ABOVE the pivot: a (nation, segment)
        // cell with NO rows surfaces as NULL after pivoting no matter
        // what the aggregate wraps (the agg never runs for an empty
        // cell), and the oracle's conditional aggregation reports 0
        // there — dense SFs hid this until the sf0.001 sweep
        .select($"c_nationkey" +: mktSegments.map(m =>
          coalesce(col(m), lit(0L)).as(s"rev_${m.toLowerCase}")): _*)
    },
    Some {
      val cols = mktSegments.map(m =>
        s"""CAST(COALESCE(SUM(CASE WHEN c_mktsegment = '$m'
           |  THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT)
           |  AS rev_${m.toLowerCase}""".stripMargin).mkString(",\n             ")
      s"""
      SELECT c_nationkey,
             $cols
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1
    """.stripMargin.trim
    },
  )

  // ---------------------------------------------------------------------
  // Month-over-month revenue growth — the time-series growth join
  // WITHOUT a global-order window: monthly totals self-join on
  // month-1 (an equi-join on the tiny month table), growth in ppm.
  // First month reports null growth.
  // ---------------------------------------------------------------------
  val qMonthlyGrowth = Q(
    "q_monthly_growth",
    (s, d) => {
      import s.implicits._
      val monthly = Tables.orders(s, d)
        .select(expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)").as("m"),
          centsL($"o_totalprice").cast("long").as("cents"))
        .groupBy($"m").agg(sum($"cents").as("rev_cents"))
      monthly
        .join(monthly.select(($"m" + 1).as("m"), $"rev_cents".as("prev_cents")),
          Seq("m"), "left")
        .select($"m", $"rev_cents", $"prev_cents",
          expr("CASE WHEN prev_cents > 0 THEN ((rev_cents - prev_cents) * 1000000) div prev_cents END")
            .as("growth_ppm"))
    },
    Some("""
      WITH monthly AS (
        SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1)
      SELECT c.m, c.rev_cents, p.rev_cents AS prev_cents,
             CASE WHEN p.rev_cents > 0
                  THEN ((c.rev_cents - p.rev_cents) * 1000000) // p.rev_cents END AS growth_ppm
      FROM monthly c LEFT JOIN monthly p ON p.m = c.m - 1
    """.stripMargin.trim),
  )

  val qs: Seq[Q] = Seq(
    qProfile,
    qRevenueRollup,
    qCustomerDeciles,
    qAboveNationAvg,
    qSegmentPivot,
    qMonthlyGrowth,
    q1PricingSummary,
    q3ShippingPriority,
    q5NationRevenue,
    q6ForecastRevenue,
    qTopCustomersPerNation,
    qOrderPriorityCount,
    qDormantCustomers,
    qPartSupplierStats,
  )
}
