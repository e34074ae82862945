package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.mr.{Emit, KV, MapReduce}

/** Fourth tranche: the reference's map-side-join idiom through the
  * MapReduce layer (constructor lookup state → broadcast variable),
  * sliding event-time windows, and a JSON source/sink round-trip.
  */
object Relational4 {

  /** Map-side join via constructor state — the reference's O17 pattern
    * (`/root/reference/tests/test_mapreduce_sorting.py:144-145,156`:
    * `self.day_ym` lookup dict used inside the reducer). Here the
    * lookup ships as a Spark broadcast variable: one copy per executor,
    * zero shuffle for the join — the distributed form of "build the
    * dict in __init__".
    */
  class NationEnrich(lookup: org.apache.spark.broadcast.Broadcast[Map[Int, String]])
    extends MapReduce[(Int, Double), String, Int, Double] {
    def mapper(r: (Int, Double)): IterableOnce[Emit[String, Int, Double]] =
      Iterator.single(KV(lookup.value.getOrElse(r._1, "UNKNOWN"), r._2))
    def reducer(k: String, vs: Iterator[Double]): IterableOnce[Emit[String, Int, Double]] =
      Iterator.single(KV(k, vs.sum))
  }

  def mr05MapsideJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nations = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name")).as[(Int, String)]
      .collect().toMap
    val bc = s.sparkContext.broadcast(nations)
    val cust = Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_acctbal")).as[(Int, Double)].rdd
    new NationEnrich(bc).run(cust)
      .map { case (k, vs) => (k, vs.head) }
      .toDF("n_name", "sum_raw")
      .select(col("n_name"), round(col("sum_raw"), 2).as("sum_acctbal"))
  }

  /** Sliding event-time windows (1 h window, 30 min slide): every event
    * lands in exactly two windows; Spark's Expand generates both
    * assignments before one shared shuffle — the same plan shape
    * streaming uses, so this is the batch twin of a sliding
    * `window()` aggregation on an unbounded source.
    */
  def st03SlidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** JSON sink + source round-trip (line-delimited JSON, explicit read
    * schema) — completing the connector matrix with q29's CSV.
    */
  def q30JsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = graft.core.Staging.tempAtExit("graft_json_")
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .write.mode("overwrite").json(tmp)
    s.read.schema("doc_id LONG, source STRING, n_chars LONG").json(tmp)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr05_mapside_join" -> mr05MapsideJoin,
    "st03_sliding_window" -> st03SlidingWindow,
    "q30_json_roundtrip" -> q30JsonRoundtrip)

  val oracles: Map[String, String] = Map(
    "mr05_mapside_join" ->
      """SELECT n_name, round(sum(c_acctbal), 2) AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1""",
    // Every event belongs to the two 30-min-aligned window starts
    // s ∈ {floor(t/30m)·30m, that − 30m}; both satisfy s ≤ t < s+1h.
    "st03_sliding_window" ->
      """SELECT to_timestamp(win_s)::TIMESTAMP AS win_start, event_type,
         count(*) AS n, round(sum(value), 2) AS sum_value
         FROM (
           SELECT value, event_type,
             (epoch_us(ts) // 1000000 // 1800) * 1800 - off AS win_s
           FROM events, unnest([0, 1800]) AS u(off))
         GROUP BY 1, 2""",
    "q30_json_roundtrip" ->
      """SELECT source, count(*) AS n,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY 1""")
}
