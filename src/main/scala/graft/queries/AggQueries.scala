package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Aggregators.{CounterMerge, TopKByCount}

/** The typed-Aggregator library exercised through the oracle gate:
  * each query computes an answer Spark could also get declaratively,
  * but through the custom partial-aggregation machinery — proving the
  * Counter-merge / bounded-top-k semantics (the reference's map-side
  * combine idiom, `/root/reference/docs.rst:236-276`) hold under
  * distributed merge order.
  */
object AggQueries {

  /** Per-language word counts via CounterMerge: one shuffle of merged
    * Counter buffers (5 langs × vocab), not one row per token.
    */
  def a01CounterMerge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // whole documents flow into the aggregator (5k rows, not 330k
    // exploded tokens) — the buffer does the per-line pre-aggregation,
    // exactly the reference's Counter-per-line idiom
    val docs = Tables.documents(s, d)
      .select(col("lang"), col("text")).as[(String, String)]
    docs.groupByKey(_._1)
      .agg(new CounterMerge[(String, String)](
        r => r._2.toLowerCase.split("\\s+").iterator.filter(_.nonEmpty))
        .toColumn.name("counts"))
      .toDF("lang", "counts")
      .select(col("lang"), explode(col("counts")).as(Seq("word", "n")))
  }

  /** Per-language top-3 words via the bounded TopKByCount buffer —
    * `Counter.most_common(3)` per key without any driver-side step.
    */
  def a02TopKPerKey(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select(col("lang"), explode(
        filter(split(lower(col("text")), "\\s+"), x => x =!= "")).as("tok"))
      .as[(String, String)]
    toks.groupByKey(_._1)
      .agg(new TopKByCount[(String, String)](3, t => (t._2, 1L)).toColumn.name("top"))
      .toDF("lang", "top")
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
        col("col._1").as("word"), col("col._2").as("n"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a01_counter_merge" -> a01CounterMerge,
    "a02_topk_per_key" -> a02TopKPerKey)

  val oracles: Map[String, String] = Map(
    "a01_counter_merge" ->
      """SELECT lang, word, count(*) AS n FROM (
           SELECT lang, unnest(list_filter(
             regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS word
           FROM documents) t GROUP BY 1, 2""",
    "a02_topk_per_key" ->
      """SELECT lang, rank, word, n FROM (
           SELECT lang, word, n, row_number() OVER (
             PARTITION BY lang ORDER BY n DESC, word) AS rank
           FROM (
             SELECT lang, word, count(*) AS n FROM (
               SELECT lang, unnest(list_filter(
                 regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS word
               FROM documents) t GROUP BY 1, 2) c) r
         WHERE rank <= 3""")
}
