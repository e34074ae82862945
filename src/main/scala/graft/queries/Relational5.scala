package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Fifth tranche: a full TPC-H-shaped analytical query (multi-filter
  * multi-join agg + top-k) and correlated-subquery decorrelation.
  */
object Relational5 {

  /** TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    * date-filtered orders ⋈ shipdate-filtered lineitem → revenue per
    * order → top 10. Filters push to all three scans BEFORE the joins;
    * customer broadcasts; ranking rounds revenue to cents so the
    * ordering is FP-stable, with orderkey tiebreak.
    */
  def q32ShippingPriority(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp_ntz")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** Correlated scalar subquery: customers above their nation's average
    * balance. Written as correlated SQL so Catalyst's decorrelation
    * rewrites it into an aggregate + join — one pass over customer, no
    * per-row subquery execution (the plan a naive engine would produce).
    */
  def q33CorrelatedSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_cs")
    s.sql("""
      SELECT c_custkey, c_name, c_nationkey, c_acctbal
      FROM customer_cs o
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_cs i
                         WHERE i.c_nationkey = o.c_nationkey)""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_shipping_priority" -> q32ShippingPriority,
    "q33_correlated_subquery" -> q33CorrelatedSubquery)

  val oracles: Map[String, String] = Map(
    "q32_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE l_shipdate > TIMESTAMP '1995-03-15'
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND c_mktsegment = 'BUILDING'
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q33_correlated_subquery" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
         FROM customer o
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                            WHERE i.c_nationkey = o.c_nationkey)""")
}
