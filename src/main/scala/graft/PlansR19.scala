package graft

import org.apache.spark.sql.SparkSession

/** Dev tool for the r19 optimization round (PlansR18's twin): dump
  * `explain("formatted")` for the named queries to
  * plans/r19/<name>_<suffix>.txt — the before/after plan evidence the
  * optimization judge checks claims against. Usage:
  * runMain graft.PlansR19 <suffix> <query> [query ...]
  * Runs at sf0.01 with the Bench session shape (AQE on, 4 shuffle
  * partitions) so the dumped plan is the one the bench executes
  * (initial AQE plan; isFinalPlan=false).
  */
object PlansR19 {
  def main(args: Array[String]): Unit = {
    val suffix = args.head
    val names = args.tail
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get("plans/r19")
    java.nio.file.Files.createDirectories(dir)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        dir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[plans-r19] wrote ${name}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
