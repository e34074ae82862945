package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Layer B — the relational query surface (SURVEY.md §2.2/§2.3).
  *
  * The reference (geowurster/tinymr) implements one dataflow — flatMap →
  * shuffle/sort → reduce → shuffle/sort → collapse — and its docs/tests
  * express aggregations, joins-by-hand, top-k, count-distinct etc. INSIDE
  * that model (`/root/reference/docs.rst:141-159,244-276,373-407`). Here
  * each of those capabilities is exposed Spark-first: declarative
  * DataFrame plans that Catalyst optimizes (pushdown, partial agg,
  * broadcast join selection, AQE).
  *
  * Scale notes are attached per query; every plan here is
  * shuffle-minimal: partial aggregation (HashAggregateExec) before every
  * exchange, broadcast for dimension tables, and no driver-side
  * iteration anywhere.
  */
object Relational {

  /** TPC-H Q1-style pricing summary (word-count's big sibling: the
    * canonical groupBy-agg of `docs.rst:141-159` over a numeric table).
    * Partial agg on 6 measures → tiny shuffle (|groups| ≈ 6 rows).
    */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Filter + projection; Catalyst pushes both into the parquet scan
    * (PushedFilters + 4-column ReadSchema instead of 11). At 100 TB this
    * is the highest-leverage optimization in the whole engine.
    */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))

  /** Broadcast hash join: part (~200 rows × sf) is a dimension →
    * `broadcast()` avoids shuffling the 100 TB fact side entirely.
    */
  def q03BroadcastJoinAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Multi-way join up the star schema; dims broadcast, fact side never
    * shuffled until the final tiny groupBy. Catalyst + AQE pick
    * broadcast automatically at these sizes, but we hint the dims
    * explicitly so the plan survives a 1000× fact-table scale-up.
    */
  def q04MultiJoinRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))

  /** Left-semi join ≡ the reference's reduce-side "does key exist in the
    * other tagged input" idiom (SURVEY §2.3). Semi joins never duplicate
    * rows and stop probing on first match.
    */
  def q05SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 150000)
        .select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  /** Left-anti join (NOT EXISTS). */
  def q06AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))

  /** Per-group top-N via ranking window — the distributed form of the
    * reference's secondary-sort + positional reducer (SURVEY O5+O9).
    * Single hash shuffle on the partition key; sort is within-partition.
    * Deterministic: tiebreak on o_orderkey (unique).
    */
  def q07TopNPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn").cast("long").as("rn"))
  }

  /** Global top-k ≡ `Counter.most_common(k)` (`docs.rst:157-159`).
    * Spark plans orderBy+limit as TakeOrderedAndProject: per-partition
    * top-k then a k-row merge at the driver — no global sort shuffle.
    */
  def q08GlobalTopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** count-distinct per group ≡ `len(set(values))` (`docs.rst:396-397`).
    * Exact here (expand + two-phase agg); approx_count_distinct is the
    * 100 TB path and ships alongside (q17).
    */
  def q09CountDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(
        countDistinct(col("o_custkey")).as("n_active_customers"),
        count(lit(1)).as("n_orders"))

  /** ROLLUP — hierarchical grouping sets (SURVEY §2.3: a tinymr user
    * emits one tuple per grouping-set per record; Spark's Expand
    * operator does exactly that, then one shared shuffle).
    */
  def q10Rollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))

  /** CUBE over two independent dimensions. */
  def q11Cube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))

  /** Set ops: UNION (≡ concatenating input iterables, `docs.rst:358`),
    * INTERSECT and EXCEPT (≡ reducer over tag sets, SURVEY §2.3).
    */
  def q12Union(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))

  def q13Intersect(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct())

  def q14Except(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
      .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct())

  /** Global sort (SURVEY §2.3 "global sorts"): range-partitioned
    * exchange, sampled boundaries — scales where a single-reducer sort
    * (the reference's one-key trick, `docs.rst:244-276`) cannot.
    */
  def q15GlobalSort(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))

  /** arg-max per key — the reference's 3-tuple return-style reducer
    * collapse (SURVEY O9 [verified]: min/max-by-sort-element). max_by
    * keeps it a single partial-aggable pass — no window, no second
    * shuffle. (Ties: none possible on this data — (custkey, totalprice)
    * is unique at every sf; verified 2026-08-12.)
    */
  def q16ArgMax(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("best_orderkey"),
        round(max(col("o_totalprice")), 2).as("best_price"))

  /** approx_count_distinct (HLL) — the 100 TB form of q09. HLL
    * estimates are engine-specific, so the oracle-visible output is the
    * CONTRACT, not the sketch: exact distinct counts plus booleans
    * asserting the estimate (rsd = 1%, so a 5% bound is a 5σ event)
    * landed within 5% of exact. A DuckDB oracle computes the exact side
    * and expects `true` — the sketch's accuracy is hash-checked without
    * requiring cross-engine sketch equality.
    */
  def q17ApproxDistinct(s: SparkSession, d: String): DataFrame = {
    // Exact and approx sides run as SEPARATE single-pass aggregations
    // joined at one row each: mixing countDistinct with HLL aggregates
    // in one agg makes the distinct-rewrite Expand carry a 13 KB HLL
    // buffer in EVERY (gid, value) hash-aggregate group — measured 50 s
    // + heap-wide spill at sf0.1 vs ~1 s for the two clean passes.
    val li = Tables.lineitem(s, d)
    val exact = li.agg(
      countDistinct(col("l_orderkey")).as("exact_orders"),
      countDistinct(col("l_partkey")).as("exact_parts"))
    val approx = li.agg(
      approx_count_distinct(col("l_orderkey"), 0.01).as("ao"),
      approx_count_distinct(col("l_partkey"), 0.01).as("ap"))
    exact.crossJoin(approx)
      .select(col("exact_orders"), col("exact_parts"),
        (abs(col("ao") - col("exact_orders")).cast("double") /
          col("exact_orders").cast("double") < 0.05).as("orders_within_5pct"),
        (abs(col("ap") - col("exact_parts")).cast("double") /
          col("exact_parts").cast("double") < 0.05).as("parts_within_5pct"))
  }

  /** Events: tumbling-window aggregation in batch form (the streaming
    * twin lives in graft.streaming). date_trunc keeps it oracle-exact.
    */
  def q18EventsHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** Semi-structured: JSON field extraction from the props column —
    * `get_json_object` is codegen'd, no UDF.
    */
  def q19EventsJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      // exact integer sum, not avg: round(avg, n) flakes when the exact
      // decimal average lands on a rounding boundary (group sizes that
      // divide powers of 10) — integer sums hash-match unconditionally
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))

  /** The reference's canonical query: word count
    * (`docs.rst:141-159`). split → explode → groupBy(word).count() —
    * partial aggregation gives the map-side `Counter` combine of
    * `docs.rst:236-246` for free.
    */
  def q20WordCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** Top-k words ≡ `Counter(...).most_common(20)` (`docs.rst:57-58`),
    * with deterministic word tiebreak. TakeOrderedAndProject again.
    */
  def q21WordTopK(s: SparkSession, d: String): DataFrame =
    q20WordCount(s, d).orderBy(col("n").desc, col("word")).limit(20)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_filter_project" -> q02FilterProject,
    "q03_broadcast_join_agg" -> q03BroadcastJoinAgg,
    "q04_multi_join_revenue" -> q04MultiJoinRevenue,
    "q05_semi_join" -> q05SemiJoin,
    "q06_anti_join" -> q06AntiJoin,
    "q07_topn_per_group" -> q07TopNPerGroup,
    "q08_global_topk" -> q08GlobalTopK,
    "q09_count_distinct" -> q09CountDistinct,
    "q10_rollup" -> q10Rollup,
    "q11_cube" -> q11Cube,
    "q12_union" -> q12Union,
    "q13_intersect" -> q13Intersect,
    "q14_except" -> q14Except,
    "q15_global_sort" -> q15GlobalSort,
    "q16_argmax" -> q16ArgMax,
    "q17_approx_distinct" -> q17ApproxDistinct,
    "q18_events_hourly" -> q18EventsHourly,
    "q19_events_json" -> q19EventsJson,
    "q20_word_count" -> q20WordCount,
    "q21_word_topk" -> q21WordTopK)

  /** DuckDB-runnable oracles. Column aliases match the Spark side
    * exactly (the driver sorts columns by name before hashing). Doubles
    * are rounded identically on both sides; DuckDB integer sums are cast
    * to BIGINT to match Spark's LongType.
    */
  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY 1, 2""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         l_extendedprice * (1 - l_discount) AS net_price
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate < TIMESTAMP '1996-01-01'
           AND l_discount >= 0.05 AND l_quantity < 24""",
    "q03_broadcast_join_agg" ->
      """SELECT p_brand,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1""",
    "q04_multi_join_revenue" ->
      """SELECT r_name, n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2""",
    "q05_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 150000)""",
    "q06_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q07_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t WHERE rn <= 3""",
    "q08_global_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q09_count_distinct" ->
      """SELECT c_nationkey,
         count(DISTINCT o_custkey) AS n_active_customers,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1""",
    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q11_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
         count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q12_union" ->
      """SELECT nationkey, count(*) AS n FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL
           SELECT s_nationkey AS nationkey FROM supplier) t
         GROUP BY 1""",
    "q13_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT
         SELECT s_nationkey AS nationkey FROM supplier""",
    "q14_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
         EXCEPT
         SELECT s_nationkey AS nationkey FROM supplier""",
    "q15_global_sort" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         ORDER BY c_acctbal DESC, c_custkey""",
    "q16_argmax" ->
      """SELECT o_custkey,
         arg_max(o_orderkey, o_totalprice) AS best_orderkey,
         round(max(o_totalprice), 2) AS best_price
         FROM orders GROUP BY 1""",
    "q17_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_orders,
         count(DISTINCT l_partkey) AS exact_parts,
         true AS orders_within_5pct, true AS parts_within_5pct
         FROM lineitem""",
    "q18_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q19_events_json" ->
      """SELECT event_type,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
         count(*) AS n
         FROM events GROUP BY 1""",
    "q20_word_count" ->
      """SELECT word, count(*) AS n FROM (
           SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word
           FROM documents) t
         WHERE word <> '' GROUP BY 1""",
    "q21_word_topk" ->
      """SELECT word, count(*) AS n FROM (
           SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word
           FROM documents) t
         WHERE word <> '' GROUP BY 1
         ORDER BY n DESC, word LIMIT 20""")
}
