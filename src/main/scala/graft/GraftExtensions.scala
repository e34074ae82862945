package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorExpressions._

/** Session extension registering every graft native expression as a
  * permanent SQL function — the canonical integration point, so plain
  * SQL sessions (thrift server, `spark.sql(...)`, notebooks) get the
  * functions without calling `VectorExpressions.register` imperatively:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   // or .withExtensions(new GraftExtensions)
  * }}}
  *
  * Demo main: `sbt "runMain graft.ExtensionsDemo"`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
      ("graft_dot", "dot product of two double arrays",
        es => DotProduct(es.head, es(1))),
      ("graft_sumsq", "sum of squares of a double array",
        es => SumSquares(es.head)),
      ("graft_minhash", "64-perm MinHash signature of a string array",
        es => MinHashSig(es.head)),
      ("graft_minhash_bands", "32 combined LSH band keys",
        es => MinHashBands(es.head)),
      ("graft_shingles", "distinct word 3-gram shingles",
        es => ShingleSet(es.head, 3)),
      ("graft_lsh_bucket", "8-bit hyperplane LSH bucket",
        es => LshBucket(es.head)),
      ("graft_trigrams", "character trigrams",
        es => CharGrams(es.head, 3, distinct = false)),
      ("graft_trigrams_distinct", "distinct character trigrams",
        es => CharGrams(es.head, 3, distinct = true)),
      ("graft_simhash32", "32-bit SimHash of a token array",
        es => SimHash32(es.head)),
      ("graft_trigram_counts", "per-document trigram -> count map",
        es => CharGramCounts(es.head, 3)),
      ("graft_trigram_hashes", "xxhash64 of each distinct trigram",
        es => CharGramHashes(es.head, 3)))
    fns.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
  }
}

/** Smoke main proving the extension path works in a fresh session. */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "graft_shingles('a b c d') AS sh").head()
    println(s"[ext] graft_dot=${row.getDouble(0)} shingles=${row.getSeq[String](1)}")
    assert(row.getDouble(0) == 11.0)
    spark.stop()
  }
}
