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
        es => CharGramHashes(es.head, 3)),
      ("graft_trigram_packed_counts", "packed trigram -> count map",
        es => CharGramPackedCounts(es.head, 3)),
      ("graft_trigram_packed", "distinct order-preserving packed trigrams",
        es => CharGramPackedDistinct(es.head, 3)),
      ("graft_shingles5", "distinct word 5-gram shingles",
        es => ShingleSet(es.head, 5)),
      ("graft_word_bigrams", "word bigrams, every occurrence",
        es => WordGramList(es.head, 2)),
      ("graft_rproj", "16-dim signed random projection",
        es => RandomProjection(es.head)),
      ("graft_simhash64", "64-bit SimHash of a token array",
        es => SimHash64(es.head)),
      ("graft_sq_dequantize", "fused 8-bit scalar quantize -> midpoint dequantize",
        es => SqDequantize(es.head, es(1), es(2))),
      ("graft_pq_reconstruct", "fused product-quantization encode -> decode",
        es => PqReconstruct(es.head, es(1))),
      ("graft_common_sorted", "common-element count of two sorted distinct long arrays",
        es => SortedCommonCount(es.head, es(1))))
    fns.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    e.injectOptimizerRule(_ => GraftRules.DotSelfToSumSq)
  }
}

/** Optimizer rules shipped with the extension — the `Rule[LogicalPlan]`
  * integration point (SURVEY §7: drop to custom Catalyst only where
  * built-ins can't express the semantics; a rule is how ENGINE
  * knowledge about its own functions reaches plans the USER wrote).
  */
object GraftRules {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.catalyst.rules.Rule

  /** Algebraic rewrite: `graft_dot(x, x)` → `graft_sumsq(x)` — a user
    * computing a norm through the general dot product gets the
    * single-traversal form (and Catalyst can then CSE it with other
    * `graft_sumsq(x)` occurrences, e.g. a hand-written norm column).
    * Guarded on determinism: rewriting a nondeterministic x would
    * collapse two independent evaluations into one.
    */
  object DotSelfToSumSq extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case DotProduct(a, b) if a.deterministic && a.semanticEquals(b) =>
          SumSquares(a)
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
    // the injected optimizer rule rewrites the self-dot into sumsq
    // (non-constant input — a literal array would constant-fold away
    // before the assertion could see either expression)
    val q = spark.sql("SELECT graft_dot(v, v) AS n FROM " +
      "(SELECT array(cast(id AS double) + 3.0D, 4.0D) AS v FROM range(1))")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("sumsquares") && !opt.contains("dotproduct"),
      s"DotSelfToSumSq did not fire:\n$opt")
    assert(q.head().getDouble(0) == 25.0)
    println("[ext] DotSelfToSumSq rewrite verified")
    spark.stop()
  }
}
