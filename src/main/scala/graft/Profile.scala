package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    import graft.core.Tables
    val doc = Tables.documents(spark, d)
    t("warmup")(doc.count())
    val toksOnly = doc.selectExpr("doc_id",
      "filter(split(lower(text), '\\\\s+'), x -> x != '') AS t")
    t("tokenize")(toksOnly.count())
    val sh0 = toksOnly.selectExpr("doc_id",
      "explode(array_distinct(transform(sequence(1, size(t)-2), i -> concat_ws(' ', t[i-1], t[i], t[i+1])))) AS s0")
    t("shingle_explode")(sh0.count())
    val sh = sh0.select(col("doc_id"), xxhash64(col("s0")).as("s"))
    t("shingle_hash")(sh.count())
    val a = sh.as("a"); val b = sh.as("b")
    val j = a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
    t("self_join")(j.count())
    val common = j.groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).agg(count(lit(1)).as("common"))
    t("pair_agg")(common.count())
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    t("sizes")(sizes.count())
    val withSizes = common
      .join(broadcast(sizes.withColumnRenamed("doc_id","doc_a").withColumnRenamed("n","na")), "doc_a")
      .join(broadcast(sizes.withColumnRenamed("doc_id","doc_b").withColumnRenamed("n","nb")), "doc_b")
    t("with_sizes")(withSizes.count())
    val jac = withSizes.withColumn("jaccard", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= 0.5)
    t("jaccard_filter")(jac.count())
    t("full_d02")(graft.queries.Dedup.d02JaccardPairs(spark, d).count())
    val plan = graft.queries.Dedup.d02JaccardPairs(spark, d).queryExecution.executedPlan.toString
    println("[plan] d02 tokenize-count=" + "split\\(lower".r.findAllIn(plan).size)
    plan.linesIterator.take(40).foreach(l => println("[plan] " + l))
    t("full_d03")(graft.queries.Dedup.d03MinhashLsh(spark, d).count())
    spark.stop()
  }
}
