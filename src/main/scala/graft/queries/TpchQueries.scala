package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** TPC-H-style multi-table analytics over the star schema (lineitem /
  * orders / customer / supplier / part / nation / region) — the
  * general-analytics surface of the engine, exercising what the
  * single-table parity queries don't: multi-way joins with broadcast
  * dimensions, selective fact filters pushed to the scan, and
  * aggregation over joined results.
  *
  * Scale shapes:
  *  - dimension tables (region 5 / nation 25 / supplier / customer)
  *    broadcast — the lineitem fact side NEVER shuffles for a dim join;
  *  - all money math in decimal (sums are partial-order independent);
  *  - every query carries a total output ordering for the oracle.
  */
object TpchQueries {
  private def dec(c: String) = col(c).cast("decimal(18,6)")

  /** Q1-style pricing summary: per (returnflag, linestatus) aggregate
    * over recent lineitem. One scan, one hash aggregate.
    *
    * Money math stays DECIMAL through the aggregation (partial-order
    * independent sums); only the FINAL projection casts to DOUBLE so the
    * driver's canonical-value hash agrees with the DuckDB oracle (whose
    * pandas bridge coerces decimals to float64). */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,6)") - dec("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q3-style shipping priority: revenue of undelivered orders for one
    * market segment, top 10. Customer (small) broadcasts into orders;
    * the joined keys then semi-filter lineitem. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > to_timestamp(lit("1997-01-01 00:00:00")))
    // Ordering is on the DOUBLE-cast revenue (not the decimal) so that any
    // cast-induced ties break identically to the oracle's double sort.
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,6)") - dec("l_discount")))
        .cast("decimal(18,6)")).cast("double").as("revenue"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  }

  /** Q5-style local-supplier volume: revenue per nation within one
    * region, suppliers joined through their nation. Region → nation →
    * supplier all broadcast; lineitem streams once. */
  def q5Region(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(spark, dir)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"))
      .agg(sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,6)") - dec("l_discount")))
        .cast("decimal(18,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Parts-by-brand profile: join lineitem to part, per-brand quantity
    * and revenue (exercises a mid-size dimension join + two-level
    * sort). */
  def brandVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(dec("l_quantity")).cast("double").as("total_qty"),
        sum(dec("l_extendedprice")).cast("double").as("total_price"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")

  /** Customers with no orders since 2000 — left anti join against a
    * date-filtered orders scan (the relational "NOT EXISTS"). */
  def customersNoOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** Orders strictly above their customer's average order value —
    * correlated-aggregate semantics via a window, DIVISION-FREE:
    * `price * n > sum` compares exact decimals (an avg would divide
    * differently across engines). */
  def aboveAvgOrders(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
    Tables.orders(spark, dir)
      .withColumn("n_orders", count(lit(1)).over(w))
      .withColumn("sum_total", sum(dec("o_totalprice")).over(w))
      .filter(dec("o_totalprice") * col("n_orders") > col("sum_total"))
      .select(col("o_orderkey"), col("o_custkey"),
        dec("o_totalprice").cast("double").as("o_totalprice"),
        col("n_orders"), col("sum_total").cast("double").as("sum_total"))
      .orderBy("o_orderkey")
  }

  /** Customer account-balance quartiles: ntile(4) over a totally
    * ordered ranking (acctbal is a 2-decimal double — ordering ties
    * broken by custkey, so tile assignment is deterministic). */
  def acctbalQuartiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), dec("c_acctbal").cast("double").as("c_acctbal"),
        ntile(4).over(w).as("quartile"))
      .orderBy("c_custkey")
  }

  /** The 100 TB twin of [[acctbalQuartiles]]: exact global ntile needs
    * a single-partition window over every row; at scale the same
    * bucketing comes from ONE-PASS approx-percentile boundaries (a
    * mergeable sketch) and a comparison against the three resulting
    * scalars — no global order anywhere. CONTRACT row in the
    * fi_stats_approx pattern: the exact customer count hash-compares,
    * and booleans assert every approximate quartile holds 25% ± 10%
    * of customers — the row fails iff the sketch-derived bucketing
    * genuinely breaks. */
  def acctbalQuartilesApprox(spark: SparkSession, dir: String): DataFrame = {
    val bounds = Tables.customer(spark, dir).agg(
      expr("approx_percentile(CAST(c_acctbal AS DOUBLE), array(0.25D, 0.5D, 0.75D), 10000)")
        .as("bs"))
      .select(col("bs").getItem(0).as("p25"), col("bs").getItem(1).as("p50"),
        col("bs").getItem(2).as("p75"))
    val bucketed = Tables.customer(spark, dir)
      .crossJoin(broadcast(bounds))
      .select(when(dec("c_acctbal").cast("double") >= col("p75"), 1)
        .when(dec("c_acctbal").cast("double") >= col("p50"), 2)
        .when(dec("c_acctbal").cast("double") >= col("p25"), 3)
        .otherwise(4).as("quartile"))
    def shareOk(qt: Int) = {
      val share = sum(when(col("quartile") === qt, 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double")
      (abs(share - 0.25) <= 0.10)
    }
    bucketed.agg(count(lit(1)).as("n_customers"),
      shareOk(1).as("q1_ok"), shareOk(2).as("q2_ok"),
      shareOk(3).as("q3_ok"), shareOk(4).as("q4_ok"))
  }

  /** Q7-style nation trade flows: revenue between (supplier nation,
    * customer nation) pairs per ship year. Exercises the one join
    * class the other q* rows don't: TWO dimension CHAINS hanging off
    * the fact (lineitem→supplier→nation AND lineitem→orders→
    * customer→nation) with a genuine fact-to-fact shuffle join on
    * orderkey in the middle — nation/supplier broadcast, while
    * orders⋈customer and lineitem⋈orders are left to AQE (at 100 TB
    * both ARE shuffle joins; hinting broadcast there would be wrong).
    * Year extraction and the diagonal filter (supp ≠ cust nation) are
    * engine-identical integer/string ops. */
  def q7Trade(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(spark, dir)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,6)") - dec("l_discount")))
        .cast("decimal(18,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q18-style large-volume customers: orders whose summed lineitem
    * quantity clears a threshold, joined back to their customer — the
    * aggregate-then-semi-join-the-fact shape (HAVING over a fact
    * aggregate feeding a key join). The aggregate output is orders-
    * sized (small); AQE broadcasts it back. Top 100 by quantity. */
  def q18BigOrders(spark: SparkSession, dir: String, minQty: Int = 350): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("total_qty").cast("double").as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q4-style priority count over CORRELATED-EXISTS semantics: orders
    * having at least one lineitem shipped more than 60 days after the
    * order date, counted by priority. The EXISTS compiles to a LEFT
    * SEMI join whose condition mixes the key equality with a
    * cross-table date predicate — the fact side is touched once and
    * never duplicated (a plain inner join would overcount orders with
    * several late lines and force a distinct). */
  def q4LateOrders(spark: SparkSession, dir: String): DataFrame =
    // EXISTS(l: l_shipdate > o_orderdate + 60d) ⟺ the order's MAX
    // shipdate clears the cutoff — aggregate lineitem to one
    // (l_orderkey, max(l_shipdate)) row per order BEFORE the join
    // (guide §2.3: aggregate before you shuffle/broadcast). The
    // semi-join side shrinks from every lineitem to one row per
    // order (~4× fewer rows), the partial aggregate combines
    // map-side, and the semi-join itself is unchanged in result:
    // max > cutoff ⟺ some shipdate > cutoff (l_shipdate is
    // non-null by schema; a group's max is null only if the group
    // is empty, which a groupBy can't emit).
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
          .groupBy("l_orderkey").agg(max(col("l_shipdate")).as("l_max_ship")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_max_ship") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** Q13-style customer order-count distribution: how many customers
    * placed exactly n orders — INCLUDING the zero bucket, which only
    * an outer join preserves (the relational twin of
    * [[graft.streaming.Events.activityHistogram]]'s power-law view).
    * Two hash aggregates after the outer join; `count(o_orderkey)`
    * counts non-null matches so empty customers land at n = 0. */
  def q13OrderCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select("c_custkey")
      .join(Tables.orders(spark, dir).select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_orders")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q4_late_orders" -> ((s, d) => q4LateOrders(s, d)),
    "q13_order_counts" -> ((s, d) => q13OrderCounts(s, d)),
    "q7_nation_trade" -> ((s, d) => q7Trade(s, d)),
    "q18_big_orders" -> ((s, d) => q18BigOrders(s, d)),
    "q1_pricing" -> ((s, d) => q1Pricing(s, d)),
    "q3_shipping" -> ((s, d) => q3Shipping(s, d)),
    "q5_region" -> ((s, d) => q5Region(s, d)),
    "q_brand_volume" -> ((s, d) => brandVolume(s, d)),
    "q_customers_no_orders" -> ((s, d) => customersNoOrders(s, d)),
    "q_above_avg_orders" -> ((s, d) => aboveAvgOrders(s, d)),
    "q_acctbal_quartiles" -> ((s, d) => acctbalQuartiles(s, d)),
    "q_acctbal_quartiles_approx" -> ((s, d) => acctbalQuartilesApprox(s, d)))

  private val discPrice =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * " +
      "(CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))"

  val oracle: Map[String, String] = Map(
    "q4_late_orders" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q13_order_counts" ->
      """WITH per AS (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey)
        |SELECT n_orders, COUNT(*) AS n_customers
        |FROM per GROUP BY n_orders ORDER BY n_orders""".stripMargin,
    "q7_nation_trade" ->
      s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         |  CAST(year(l.l_shipdate) AS INT) AS l_year,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem l
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation ns ON s.s_nationkey = ns.n_nationkey
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation nc ON c.c_nationkey = nc.n_nationkey
         |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND ns.n_name <> nc.n_name
         |GROUP BY 1, 2, 3
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 350)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  CAST(big.total_qty AS DOUBLE) AS total_qty
        |FROM orders o
        |JOIN big ON o.o_orderkey = big.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY total_qty DESC, o.o_orderkey LIMIT 100""".stripMargin,
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin,
    "q5_region" ->
      s"""SELECT n_name,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_customers_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q_above_avg_orders" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE) AS o_totalprice,
        |  n_orders, CAST(sum_total AS DOUBLE) AS sum_total
        |FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    COUNT(*) OVER w AS n_orders,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS sum_total
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey))
        |WHERE CAST(o_totalprice AS DECIMAL(18,6)) * n_orders > sum_total
        |ORDER BY o_orderkey""".stripMargin,
    "q_acctbal_quartiles" ->
      """SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,6)) AS DOUBLE) AS c_acctbal,
        |  CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INT) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_acctbal_quartiles_approx" ->
      """SELECT COUNT(*) AS n_customers, TRUE AS q1_ok, TRUE AS q2_ok,
        |  TRUE AS q3_ok, TRUE AS q4_ok
        |FROM customer""".stripMargin,
    "q_brand_volume" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
}
