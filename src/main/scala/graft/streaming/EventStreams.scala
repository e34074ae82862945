package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Structured Streaming extension (SURVEY §2.3: "streaming" has no
  * reference analogue — tinymr is strictly batch over finite iterables,
  * `/root/reference/tinymr.py:164-165` — so this is capability the
  * Spark build adds, per the P5 build plan).
  *
  * The `events` parquet is replayed as a file-source stream; the
  * windowed aggregation uses event-time + watermark so the identical
  * plan runs unchanged against a real unbounded source (Kafka etc.) on
  * a cluster. For the correctness gate the stream is drained to a
  * memory sink synchronously and the final counts must equal the batch
  * oracle — the streaming/batch unification Spark guarantees.
  */
object EventStreams {

  /** Tumbling 1-hour event-time windows with a 2-hour watermark.
    * Complete output mode: on a finite replay the final state equals
    * the batch q18 aggregation — and shares its DuckDB oracle.
    */
  def st01StreamHourly(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$d/events.parquet").schema
    // The file stream source requires a directory; stage a symlink to
    // the single events.parquet in a temp dir (read-only testdata).
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$d/events.parquet"))
    dir.toFile.deleteOnExit()
    val stream = s.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    val agg = stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    val name = "st01_sink"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Sessionization: per-user sessions closed by a 30-minute gap —
    * the custom-state shape (`flatMapGroupsWithState` in streaming; here
    * the batch twin via `flatMapGroups` over a secondary-sorted group,
    * which is exactly the reference's sorted-reducer idiom, SURVEY O5).
    * One shuffle on user_id; per-user events sorted in-task.
    */
  def st02Sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("tsus"), col("event_id"))
      .as[(Long, Long, Long)]
    val gapUs = 30L * 60 * 1000000
    ev.groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        var sessionId = 0L
        var out = List.newBuilder[(Long, Long, Long, Long, Long)]
        var start = 0L; var last = 0L; var n = 0L
        for (e <- evs) {
          if (n == 0 || e._2 - last > gapUs) {
            if (n > 0) out += ((uid, sessionId, n, start, last))
            sessionId += 1; start = e._2; n = 0
          }
          last = e._2; n += 1
        }
        if (n > 0) out += ((uid, sessionId, n, start, last))
        out.result()
      }
      .toDF("user_id", "session_id", "n_events", "start_us", "end_us")
      .select(col("user_id"), col("session_id"), col("n_events"),
        timestamp_micros(col("start_us")).as("session_start"),
        timestamp_micros(col("end_us")).as("session_end"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st01_stream_hourly" -> st01StreamHourly,
    "st02_sessionize" -> st02Sessionize)

  val oracles: Map[String, String] = Map(
    "st01_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2""",
    "st02_sessionize" ->
      """WITH marked AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         sess AS (
           SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS UNBOUNDED PRECEDING) AS session_id
           FROM marked)
         SELECT user_id, session_id, count(*) AS n_events,
           date_trunc('microsecond', min(ts)) AS session_start,
           date_trunc('microsecond', max(ts)) AS session_end
         FROM sess GROUP BY 1, 2""")
}
