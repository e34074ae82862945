package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.mr.{Emit, KV, MapReduce}

/** Third tranche: global single-key aggregation through the MapReduce
  * layer (the reference's `None`-key idiom), typed JSON structs, a
  * CSV source/sink round-trip (the reference has no connectors at all —
  * callers open files; SURVEY §2.3 row 1), and a salted two-stage
  * aggregation demonstrating the skew pattern the 100 TB design calls
  * for.
  */
object Relational3 {

  /** Global aggregation via a single routing key — the reference's
    * `None`-key pattern ("routed to a single reducer",
    * `/root/reference/docs.rst:244-276`). The mapper pre-aggregates its
    * partition's rows (the Counter idiom, docs.rst:236-246) so the
    * single reducer merges |partitions| values, not |rows| — the only
    * way a global reduce scales.
    */
  class GlobalSum extends MapReduce[Double, String, Int, Double] {
    override def numPartitions: Option[Int] = Some(1)
    def mapper(qty: Double): IterableOnce[Emit[String, Int, Double]] =
      Iterator.single(KV("all", qty))
    def reducer(k: String, vs: Iterator[Double]): IterableOnce[Emit[String, Int, Double]] =
      Iterator.single(KV(k, vs.sum))
  }

  def mr04GlobalAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qty = Tables.lineitem(s, d).select("l_quantity").as[Double].rdd
    // map-side combine: one partial sum per partition crosses the wire
    val partial = qty.mapPartitions(it => Iterator.single(it.sum))
    new GlobalSum().run(partial)
      .map { case (k, vs) => (k, vs.head) }
      .toDF("k", "sum_raw")
      .select(col("k"), round(col("sum_raw"), 2).as("sum_qty"))
  }

  /** Typed JSON: `from_json` into a struct schema (vs q19's path
    * extraction) — the semi-structured column becomes first-class
    * nested data Catalyst can prune into.
    */
  def q28JsonStruct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("p", from_json(col("props"), lit("k INT")))
      .groupBy(col("p.k").cast("long").as("k"))
      // round(sum, 2) is boundary-safe for 2-decimal inputs (the exact
      // sum has 2 decimals, so the 1e-12 order error can't cross a
      // boundary); round(avg, 4) is NOT — see q19
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** CSV sink + source round-trip: the reference has no file formats
    * (callers pass opened iterables, docs.rst:343-347); here the
    * engine owns serialization. Written with an explicit schema and
    * read back with one — header-safe, scale-safe (one file per
    * partition).
    */
  def q29CsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = graft.core.Staging.tempAtExit("graft_csv_")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").option("header", "true").csv(tmp)
    s.read.option("header", "true")
      .schema("doc_id LONG, lang STRING, n_chars LONG")
      .csv(tmp)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
  }

  /** Salted two-stage aggregation — the skew-mitigation pattern (a hot
    * key fans out over 8 salts, partial-aggregates, then merges). On
    * skewless test data the answer equals the plain groupBy (the
    * oracle); at 100 TB this is the difference between one straggler
    * task and 8 balanced ones. AQE's skew-join handling covers joins;
    * this covers aggregations.
    */
  def q31SaltedAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(8)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity")).as("partial_qty"), count(lit(1)).as("partial_n"))
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("partial_qty")), 2).as("sum_qty"),
        sum(col("partial_n")).as("n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr04_global_agg" -> mr04GlobalAgg,
    "q28_json_struct" -> q28JsonStruct,
    "q29_csv_roundtrip" -> q29CsvRoundtrip,
    "q31_salted_agg" -> q31SaltedAgg)

  val oracles: Map[String, String] = Map(
    "mr04_global_agg" ->
      """SELECT 'all' AS k, round(sum(l_quantity), 2) AS sum_qty FROM lineitem""",
    "q28_json_struct" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1""",
    "q29_csv_roundtrip" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY 1""",
    "q31_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
         count(*) AS n
         FROM lineitem GROUP BY 1""")
}
