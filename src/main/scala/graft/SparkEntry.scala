package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query/oracle maps. Every queries key that
  * has an oracleSql entry is hash-checked against DuckDB by the driver;
  * keys without one get a rows-only check (reserved for ops whose exact
  * output is not ANSI-SQL-expressible: LSH, sketches, streaming).
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.Relational.queries, graft.queries.Relational.oracles),
      (graft.queries.Relational2.queries, graft.queries.Relational2.oracles),
      (graft.queries.Relational3.queries, graft.queries.Relational3.oracles),
      (graft.queries.Relational4.queries, graft.queries.Relational4.oracles),
      (graft.queries.Relational5.queries, graft.queries.Relational5.oracles),
      (graft.queries.Relational6.queries, graft.queries.Relational6.oracles),
      (graft.queries.Relational7.queries, graft.queries.Relational7.oracles),
      (graft.queries.Relational8.queries, graft.queries.Relational8.oracles),
      (graft.queries.Relational9.queries, graft.queries.Relational9.oracles),
      (graft.queries.Relational10.queries, graft.queries.Relational10.oracles),
      (graft.queries.PipelineOps.queries, graft.queries.PipelineOps.oracles),
      (graft.queries.MrQueries.queries, graft.queries.MrQueries.oracles),
      (graft.queries.TextOps.queries, graft.queries.TextOps.oracles),
      (graft.queries.Dedup.queries, graft.queries.Dedup.oracles),
      (graft.queries.Similarity.queries, graft.queries.Similarity.oracles),
      (graft.queries.Multimodal.queries, graft.queries.Multimodal.oracles),
      (graft.queries.AggQueries.queries, graft.queries.AggQueries.oracles),
      (graft.streaming.EventStreams.queries, graft.streaming.EventStreams.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
