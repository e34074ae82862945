package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: times any subset of SparkEntry queries at a given sf dir
  * (args: [sfDir [queryName...]]; default sf0.1, all queries) and
  * prints the executed plan of the slowest one — the loop used to find
  * the HOF/plan-duplication hotspots documented in ARCHITECTURE.md.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val times = names.map { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $n%-28s $dt%8.2f s")
      n -> dt
    }
    val (slowest, _) = times.maxBy(_._2)
    println(s"[prof] slowest: $slowest — plan:")
    SparkEntry.queries(slowest)(spark, d).explain()
    spark.stop()
  }
}
