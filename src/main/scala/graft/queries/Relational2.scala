package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Second tranche of the relational surface (SURVEY §2.3): explicit
  * grouping sets, analytic window frames, an as-of join (an operator
  * Spark lacks natively, composed from built-ins per the preference
  * ladder — no custom plan node needed), exact percentiles, the scalar
  * function sampler, and outer joins.
  */
object Relational2 {

  /** GROUPING SETS — the general form of rollup/cube (one Expand +
    * one shared shuffle regardless of set count).
    */
  def q22GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
    s.sql("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
      FROM lineitem_gs
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                              (l_returnflag, l_linestatus))""")
  }

  /** Analytic window functions over frames: lag/lead, running sum,
    * moving average — the reference's "sorted values + positional
    * logic in reducer" (SURVEY §2.3) as one window pass. Single
    * shuffle on the partition key.
    */
  def q23WindowAnalytics(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("running_total", round(sum(col("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .withColumn("avg3", round(avg(col("o_totalprice"))
        .over(w.rowsBetween(-1, 1)), 4))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("prev_price"), col("next_price"), col("running_total"), col("avg3"))
  }

  /** As-of join: each event matched to the user's latest order at or
    * before the event time. Spark has no ASOF JOIN operator; rather
    * than a custom SparkPlan, this composes built-ins (preference (a)
    * of the ladder): union both sides tagged, one window pass carrying
    * the last-seen order forward. One shuffle on the key — same cost
    * shape as a sort-merge join, no per-event probe. Ties: orders
    * sorting before events at equal t makes the match inclusive (<=);
    * among same-time orders the largest orderkey wins.
    */
  def q24AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
        lit(0).as("is_order"), lit(null).cast("long").as("o_orderkey"),
        col("event_id"))
    val ord = Tables.orders(s, d)
      .select(col("o_custkey").as("k"), unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
        lit(1).as("is_order"), col("o_orderkey"),
        lit(null).cast("long").as("event_id"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_order").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.union(ord)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0)
      .select(col("event_id"), col("k").as("user_id"),
        timestamp_micros(col("t")).as("ts"), col("asof_orderkey"))
  }

  /** Exact percentiles (median/p90) per group — Spark's `percentile`
    * and DuckDB's `quantile_cont` share the linear-interpolation
    * definition. At 100 TB swap to `approx_percentile` (KLL-style
    * sketch) — same API shape, mergeable state.
    */
  def q25Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
        count(lit(1)).as("n"))

  /** Scalar-function sampler: string/date/math/conditional functions in
    * one codegen'd projection (SURVEY §2.3 "scalar fns" — the reference
    * delegates these to arbitrary Python inside `mapper`).
    */
  def q26ScalarFunctions(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 3)).as("prio3"),
        length(col("o_orderstatus")).cast("long").as("status_len"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        round(abs(col("o_totalprice") - 100000), 2).as("abs_diff"),
        ceil(col("o_totalprice") / 1000).as("price_k"),
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("bucket"))

  /** Full outer join: per-nation customer and supplier counts with no
    * row loss on either side.
    */
  def q27FullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val su = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(su, Seq("nationkey"), "full_outer")
      .select(col("nationkey"), col("n_customers"), col("n_suppliers"))
  }

  /** Time-RANGE window frame — the frame family q23's ROWS frames
    * don't cover: each order's trailing-30-day revenue and order count
    * for its customer, via `RANGE BETWEEN INTERVAL 30 DAYS PRECEDING`.
    * ROWS frames count neighbours; RANGE frames resolve against EVENT
    * TIME, which is what rolling business metrics actually mean (a
    * customer with 3 orders in one week vs 3 in a year gets different
    * windows). Same scale shape as any window: one hash exchange on
    * the partition key, spillable in-partition sort.
    */
  def q54RollingRange(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("trail_rev", round(expr(
        """sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)"""), 2))
      .withColumn("trail_orders", expr(
        """count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)"""))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_rolling_range" -> q54RollingRange,
    "q22_grouping_sets" -> q22GroupingSets,
    "q23_window_analytics" -> q23WindowAnalytics,
    "q24_asof_join" -> q24AsofJoin,
    "q25_percentiles" -> q25Percentiles,
    "q26_scalar_functions" -> q26ScalarFunctions,
    "q27_full_outer" -> q27FullOuter)

  val oracles: Map[String, String] = Map(
    "q54_rolling_range" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         round(sum(o_totalprice) OVER w, 2) AS trail_rev,
         count(*) OVER w AS trail_orders
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)""",
    "q22_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                 (l_returnflag, l_linestatus))""",
    "q23_window_analytics" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
         lag(o_totalprice, 1) OVER w AS prev_price,
         lead(o_totalprice, 1) OVER w AS next_price,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS UNBOUNDED PRECEDING), 2) AS running_total,
         round(avg(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS avg3
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "q24_asof_join" ->
      """SELECT e.event_id, e.user_id,
         date_trunc('microsecond', e.ts) AS ts, o.asof_orderkey
         FROM events e LEFT JOIN LATERAL (
           SELECT max(o_orderkey) AS asof_orderkey FROM orders
           WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
             AND o_orderdate = (SELECT max(o_orderdate) FROM orders
                                WHERE o_custkey = e.user_id AND o_orderdate <= e.ts)
         ) o ON true""",
    "q25_percentiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
         round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
         count(*) AS n
         FROM lineitem GROUP BY 1""",
    "q26_scalar_functions" ->
      """SELECT o_orderkey,
         upper(substr(o_orderpriority, 1, 3)) AS prio3,
         length(o_orderstatus) AS status_len,
         o_orderstatus || '-' || o_orderpriority AS status_prio,
         year(o_orderdate) AS o_year,
         month(o_orderdate) AS o_month,
         day(o_orderdate) AS o_day,
         round(abs(o_totalprice - 100000), 2) AS abs_diff,
         ceil(o_totalprice / 1000)::BIGINT AS price_k,
         CASE WHEN o_totalprice > 200000 THEN 'high'
              WHEN o_totalprice > 100000 THEN 'mid'
              ELSE 'low' END AS bucket
         FROM orders""",
    "q27_full_outer" ->
      """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
         c.n_customers, s.n_suppliers
         FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers
               FROM customer GROUP BY 1) c
         FULL OUTER JOIN
              (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
               FROM supplier GROUP BY 1) s
         USING (nationkey)""")
}
