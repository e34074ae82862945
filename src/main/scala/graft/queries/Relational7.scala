package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Seventh tranche: sketch-contract checking for quantiles (q17's
  * pattern applied to approx_percentile) and event-funnel analytics —
  * both pure conditional aggregations, one partial-aggable shuffle
  * each.
  */
object Relational7 {

  /** approx_percentile (Greenwald–Khanna sketch) with an
    * oracle-checkable CONTRACT, like q17: the sketch guarantees rank
    * error ≤ n/accuracy (here 1/10000 in quantile units), so the
    * approx value must lie between the exact percentiles at q ∓ 5e-4
    * (a 5× margin on the bound). The exact side exists to CHECK the
    * sketch; at 100 TB only the approx side runs — its state is a
    * fixed-size buffer per group, vs the exact percentile's
    * all-values buffer.
    */
  def q39ApproxPercentiles(s: SparkSession, d: String): DataFrame = {
    // EXACT side via the q65 two-level ranking machinery
    // (Relational10.twoLevelRankAndSizes — spec-pinned to equal
    // Spark's own `percentile` aggregate on randomized frames) instead
    // of the `percentile(..., array(...))` form: that aggregate
    // buffers EVERY value of the table in ONE task's OpenHashMap and
    // sorts it there (the single-task wall the r18 notes deferred —
    // measured ~2 s of the query at sf0.1 and growing linearly with
    // table size, vs the distributed rank's bounded per-task work).
    // The 6 interpolations run the explicit v_lo + (v_hi−v_lo)·frac
    // form; the oracle compares at round-4, many orders of magnitude
    // above the formulations' 1-ulp association differences (q65's
    // analysis), and the rank-tolerance booleans compare the sketch
    // against exact order statistics ∓5e-4 QUANTILES away — thousands
    // of ranks at any realistic n, so a last-ulp wiggle on the bounds
    // cannot flip them.
    val li = Tables.lineitem(s, d)
      .select(lit("all").as("g"), col("l_extendedprice").as("v"))
    val (ranked0, sizes) = Relational10.twoLevelRankAndSizes(li, Seq.empty)
    val ranked = ranked0.withColumn("rk", col("rnk") - 1)
    val ps = Seq(0.4995, 0.5, 0.5005, 0.9495, 0.95, 0.9505)
    val targets = sizes
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("pos", col("p") * (col("n") - 1).cast("double"))
      .withColumn("lo", floor(col("pos")).cast("long"))
      .withColumn("hi", ceil(col("pos")).cast("long"))
    val ex = ranked.as("rr").join(broadcast(targets.as("tt")),
        col("rr.g") === col("tt.g") &&
          (col("rk") === col("lo") || col("rk") === col("hi")))
      .groupBy(col("p"), col("pos"), col("lo"))
      .agg(min(when(col("rk") === col("lo"), col("v"))).as("v_lo"),
        min(when(col("rk") === col("hi"), col("v"))).as("v_hi"))
      .select(col("p"),
        (col("v_lo") + (col("v_hi") - col("v_lo")) *
          (col("pos") - col("lo").cast("double"))).as("q"))
    // fold the 6 (p, q) rows into one row of named quantiles; p came
    // from the same literals compared against, so equality is exact
    val exRow = ex.agg(
      min(when(col("p") === 0.4995, col("q"))).as("ex_p50_lo"),
      min(when(col("p") === 0.5, col("q"))).as("ex_p50"),
      min(when(col("p") === 0.5005, col("q"))).as("ex_p50_hi"),
      min(when(col("p") === 0.9495, col("q"))).as("ex_p95_lo"),
      min(when(col("p") === 0.95, col("q"))).as("ex_p95"),
      min(when(col("p") === 0.9505, col("q"))).as("ex_p95_hi"))
    val apRow = Tables.lineitem(s, d).agg(
      expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 10000)")
        .as("ap"))
    exRow.crossJoin(apRow).select(
      round(col("ex_p50"), 4).as("exact_p50"),
      round(col("ex_p95"), 4).as("exact_p95"),
      (element_at(col("ap"), 1) >= col("ex_p50_lo") &&
        element_at(col("ap"), 1) <= col("ex_p50_hi")).as("p50_within_rank_tol"),
      (element_at(col("ap"), 2) >= col("ex_p95_lo") &&
        element_at(col("ap"), 2) <= col("ex_p95_hi")).as("p95_within_rank_tol"))
  }

  /** Conversion funnel over the event stream: first-touch timestamp
    * per user per stage (conditional min — one partial-aggable
    * shuffle, no window), then strictly-ordered stage attainment
    * view → click → purchase. The staple product/training-data
    * analytics shape the reference could only express as per-key
    * Python inside a reducer.
    */
  def q40Funnel(s: SparkSession, d: String): DataFrame = {
    // no event_type pre-filter: the oracle groups ALL users, and a user
    // with only signup/error events must still appear (all-NULL stages)
    val firsts = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    firsts.select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
      (col("t_view").isNotNull && col("t_click").isNotNull &&
        col("t_click") > col("t_view")).as("reached_click"),
      (col("t_view").isNotNull && col("t_click").isNotNull &&
        col("t_click") > col("t_view") && col("t_purchase").isNotNull &&
        col("t_purchase") > col("t_click")).as("reached_purchase"))
  }

  /** Interval join WITHOUT an equi-key, made scalable: count platform-
    * wide `error` events within ±60 s of each `purchase`. A naive plan
    * is a BroadcastNestedLoopJoin (quadratic row comparisons — the
    * plan Spark actually picks for a raw range predicate); instead the
    * range condition becomes an EQUI-join on a 120 s time bucket: an
    * interval of length exactly one bucket spans exactly two
    * consecutive buckets, so each purchase probes its two candidate
    * buckets (explode ×2) and the exact range filter runs only on
    * bucket-colliding rows. One hash shuffle on the bucket key — the
    * standard interval-join decomposition at 100 TB. Each qualifying
    * (purchase, error) lands in exactly one bucket, so no dedup is
    * needed.
    */
  def q41IntervalBucketJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("tus").as("pt"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("tus").as("et"), expr("tus div 120000000").as("bucket"))
    val probes = purchases.select(col("purchase_id"), col("pt"),
      explode(array(expr("(pt - 60000000) div 120000000"),
        expr("(pt + 60000000) div 120000000"))).as("bucket"))
    probes.join(errors, "bucket")
      .filter(col("et") >= col("pt") - 60000000L && col("et") <= col("pt") + 60000000L)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_errors"))
  }

  /** The pure-SQL surface: temp views + `spark.sql(...)` text, calling
    * a graft native expression (`graft_shingles`) from SQL — the
    * notebook/thrift-server usage mode, inside the correctness gate.
    * Same Catalyst plan as the DataFrame form; the native function
    * resolves through the same registry `GraftExtensions` injects.
    */
  def q42SqlSurface(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    Tables.documents(s, d).createOrReplaceTempView("documents_v")
    s.sql("""
      SELECT lang, count(*) AS n_docs,
             CAST(sum(size(graft_shingles(text))) AS BIGINT) AS total_shingles
      FROM documents_v
      GROUP BY lang""")
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — the
    * join-condition corner where SQL's three-valued logic bites: a
    * plain equi-join silently DROPS rows whose key is NULL on both
    * sides (NULL = NULL is UNKNOWN), while dimension keys in real
    * lakehouses are nullable ("unknown nation") and those rows must
    * still pair up. Key 3 is nulled on both sides here, so the
    * null↔null row exists in the answer — an engine with plain-equals
    * semantics loses it and hash-mismatches. Still a hash
    * partitionable equi-join at scale: Spark plans `<=>` as a
    * SortMergeJoin/HashJoin key, not a theta join.
    */
  def q57NullSafeJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(expr("nullif(c_nationkey, 3)").as("ck"))
      .groupBy(col("ck")).agg(count(lit(1)).as("n_customers"))
    val su = Tables.supplier(s, d)
      .select(expr("nullif(s_nationkey, 3)").as("sk"))
      .groupBy(col("sk")).agg(count(lit(1)).as("n_suppliers"))
    c.join(su, col("ck") <=> col("sk"))
      .select(col("ck").as("k"), col("n_customers"), col("n_suppliers"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_null_safe_join" -> q57NullSafeJoin,
    "q39_approx_percentiles" -> q39ApproxPercentiles,
    "q40_funnel" -> q40Funnel,
    "q41_interval_bucket_join" -> q41IntervalBucketJoin,
    "q42_sql_surface" -> q42SqlSurface)

  val oracles: Map[String, String] = Map(
    "q57_null_safe_join" ->
      """WITH c AS (
           SELECT nullif(c_nationkey, 3) AS k, count(*) AS n_customers
           FROM customer GROUP BY 1),
         s AS (
           SELECT nullif(s_nationkey, 3) AS k, count(*) AS n_suppliers
           FROM supplier GROUP BY 1)
         SELECT c.k, n_customers, n_suppliers
         FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k""",
    "q39_approx_percentiles" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
         round(quantile_cont(l_extendedprice, 0.95), 4) AS exact_p95,
         true AS p50_within_rank_tol, true AS p95_within_rank_tol
         FROM lineitem""",
    "q40_funnel" ->
      """WITH f AS (
           SELECT user_id,
             date_trunc('microsecond', min(CASE WHEN event_type = 'view' THEN ts END)) AS t_view,
             date_trunc('microsecond', min(CASE WHEN event_type = 'click' THEN ts END)) AS t_click,
             date_trunc('microsecond', min(CASE WHEN event_type = 'purchase' THEN ts END)) AS t_purchase
           FROM events GROUP BY 1)
         SELECT user_id, t_view, t_click, t_purchase,
           (t_view IS NOT NULL AND t_click IS NOT NULL AND t_click > t_view) AS reached_click,
           (t_view IS NOT NULL AND t_click IS NOT NULL AND t_click > t_view
            AND t_purchase IS NOT NULL AND t_purchase > t_click) AS reached_purchase
         FROM f""",
    // DuckDB evaluates the raw range predicate directly (IEJoin); the
    // engine's bucket decomposition must produce identical counts.
    "q41_interval_bucket_join" ->
      """SELECT p.event_id AS purchase_id, count(*) AS n_errors
         FROM events p JOIN events e
           ON p.event_type = 'purchase' AND e.event_type = 'error'
          AND epoch_us(e.ts) BETWEEN epoch_us(p.ts) - 60000000
                                 AND epoch_us(p.ts) + 60000000
         GROUP BY 1""",
    "q42_sql_surface" ->
      """SELECT lang, count(*) AS n_docs,
         sum(len(list_distinct(
           list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))))::BIGINT AS total_shingles
         FROM (SELECT lang,
                 list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
               FROM documents)
         GROUP BY 1""")
}
