package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference engine has no sources at all — callers pass opened
  * iterables (`/root/reference/tinymr.py:156`, `docs.rst:343-347`). Our
  * Spark-native surface replaces that with `spark.read.parquet`, which
  * gives Catalyst a pushdown-capable scan (column pruning + predicate
  * pushdown reach the parquet footer) — essential at 100 TB where a
  * full-width scan of lineitem is the difference between minutes and
  * hours.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread a small-input scan across cores before heavy NARROW
    * stages: the fixtures ship each table as ONE parquet file (one
    * row group → one input split), so per-row-expensive projections
    * (shingling, CDC chunking, vector norms) would otherwise run
    * single-task however many cores exist — ScaleProbe measured the
    * CDC chunking 5× faster on an equal-data 32-split layout.
    * Production inputs arrive in thousands of splits and take the
    * no-op branch, so no shuffle is ever added at scale: this is
    * fixture-layout adaptation, not a plan change.
    */
  /** Spread width: defaultParallelism (every core busy) unless the
    * deployment overrides via spark.graft.spreadParts — the knob a
    * cluster uses to size fixture-layout adaptation to its own core
    * count/overhead trade (per-stage cost is tasks × rounds for the
    * iterative consumers).
    */
  private def spreadWidth(df: DataFrame): Int =
    df.sparkSession.conf.getOption("spark.graft.spreadParts")
      .map(_.toInt)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)

  def spread(df: DataFrame): DataFrame = {
    val cores = spreadWidth(df)
    // probe the layout via inputFiles, NOT df.rdd: under AQE,
    // Dataset.rdd materializes every upstream query stage at
    // construction time (silent double execution for any frame with
    // an exchange); inputFiles just lists the leaf scans' files. A
    // non-scan frame reports 0 files and gets spread — harmless for
    // the tiny local relations the specs pass.
    if (df.inputFiles.length < cores) df.repartition(cores) else df
  }

  /** [[spread]] for a frame that is then CACHED and consumed by
    * CONCURRENT jobs (the st2x micro-batch choreography): the
    * round-robin goes through the RDD layer, so the cached plan keeps
    * a LEAF under it instead of an AQE Exchange. With `spread`'s SQL
    * repartition below the cache, two futures materializing the same
    * cached partition race inside AQE stage materialization and a
    * loser surfaces "Block rdd_N not found" (observed ~1/4 full-suite
    * runs on st21); a leaf plan degrades that race to duplicate
    * compute, exactly like the raw-scan plans the choreography was
    * built on. Callers must pass an exchange-free frame (a scan/
    * projection) — `Dataset.rdd` under AQE would otherwise execute
    * upstream stages at construction (spread's docstring). The
    * Row round-trip costs microseconds at micro-batch row counts;
    * many-split production inputs take the no-op branch.
    */
  def spreadRows(df: DataFrame): DataFrame = {
    val sp = df.sparkSession
    val cores = spreadWidth(df)
    if (df.inputFiles.length < cores)
      sp.createDataFrame(df.rdd.repartition(cores), df.schema)
    else df
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) (which
    * Spark's vectorized reader rejects — read nanos as long via the
    * legacy conf, convert to micros in-plan) and plain TIMESTAMP(MICROS)
    * without a UTC flag (reads as TIMESTAMP_NTZ, which `unix_micros`,
    * watermarks, and window() reject). Branch on the inferred type and
    * normalize both to Spark's session-tz TIMESTAMP — the session tz is
    * pinned to UTC, so the NTZ→LTZ cast is value-preserving and both
    * generations of the test data load identically.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw // already a session-tz timestamp
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
