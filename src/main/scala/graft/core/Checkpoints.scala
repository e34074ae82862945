package graft.core

import org.apache.spark.sql.DataFrame

/** Round-checkpointing for the iterative loops (connected components,
  * k-means): each round needs its lineage AND plan statistics
  * truncated (the plan-doubling / stats-squaring traps documented at
  * the loops). Two interchangeable mechanisms:
  *
  *   - default: `localCheckpoint` — executor-block-backed, zero
  *     config, the right choice for a single-JVM gate run;
  *   - `spark.graft.checkpointDir` set to a durable path (HDFS /
  *     object store) switches every loop to RELIABLE checkpoints: on
  *     a real cluster a localCheckpoint block dies with its executor
  *     and a TRUNCATED lineage cannot recompute it — a 1000-executor,
  *     multi-hour loop wants files, not blocks.
  *
  * Same loop structure either way. On the reliable path the loops'
  * block-release discipline degrades to a no-op by construction (the
  * persistent-RDD set diff sees no new blocks); round files accumulate
  * under the configured dir and are reclaimed by that dir's lifecycle
  * (at 100 TB: a per-job subdir with a TTL policy), which is the
  * standard operational contract for Spark checkpoint dirs.
  */
object Checkpoints {

  // the root WE last passed to setCheckpointDir — an exact-equality
  // guard against redundant re-sets (each creates a fresh UUID
  // subdir). Comparing against sc.getCheckpointDir was wrong twice
  // over: it returns the UUID CHILD of the root, and a substring test
  // on it silently skipped the re-set whenever the configured root
  // happened to be a substring of an unrelated current dir.
  @volatile private var lastSetDir: Option[String] = None

  /** The RDD backing a frame returned by [[roundCheckpoint]], derived
    * DIRECTLY from the checkpointed plan's LogicalRDD leaf — never by
    * diffing `sc.getPersistentRDDs` around the checkpoint call, which
    * on a shared SparkContext captures (and would later evict) any
    * unrelated RDD another thread persisted inside the window. On the
    * local path this is the persisted block-backed RDD; on the
    * reliable path unpersisting it is a harmless no-op (files are the
    * backing).
    */
  def checkpointedRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  def roundCheckpoint(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption("spark.graft.checkpointDir").filter(_.nonEmpty) match {
      case Some(dir) =>
        if (!lastSetDir.contains(dir)) {
          s.sparkContext.setCheckpointDir(dir)
          lastSetDir = Some(dir)
        }
        df.checkpoint() // eager + reliable (files)
      case None => df.localCheckpoint() // eager (executor blocks)
    }
  }
}
