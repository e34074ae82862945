package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Typed `Aggregator[IN, BUF, OUT]` library (SURVEY §7.2 P3) — the
  * engine-level form of the reference's user-space map-side-combine
  * idiom: mapper pre-aggregates a `Counter` per item, reducer merges
  * with `reduce(op.iadd)` (`/root/reference/docs.rst:236-246,259-265`;
  * `tests/test_mapreduce_concurrency.py:56-75`). As Aggregators these
  * run inside Spark's partial-aggregation machinery, so the merge
  * happens map-side BEFORE the shuffle — at 100 TB the shuffle carries
  * one small buffer per key per task instead of every value.
  */
object Aggregators {

  /** Counter-merge: Map[String, Long] buffers merged associatively —
    * `collections.Counter` + `operator.iadd`, distributed.
    *
    * `tok` extracts ALL tokens of one input row (a whole document/line),
    * so each row folds into the buffer in one call — the reference's
    * idiom exactly (mapper pre-aggregates a line into a Counter,
    * `docs.rst:236-246`), and the aggregation input is |docs| rows, not
    * an exploded |tokens| stream.
    */
  class CounterMerge[I](tok: I => IterableOnce[String])
    extends Aggregator[I, mutable.Map[String, Long], Map[String, Long]] {
    def zero: mutable.Map[String, Long] = mutable.Map.empty
    def reduce(b: mutable.Map[String, Long], in: I): mutable.Map[String, Long] = {
      tok(in).iterator.foreach(t => b.update(t, b.getOrElse(t, 0L) + 1L)); b
    }
    def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }; a
    }
    def finish(b: mutable.Map[String, Long]): Map[String, Long] = b.toMap
    def bufferEncoder: Encoder[mutable.Map[String, Long]] =
      Encoders.kryo[mutable.Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Bounded top-k by count: the scalable `Counter.most_common(k)`
    * (`docs.rst:57-58,157-159`). The buffer is compacted to `cap`
    * entries, bounding shuffle volume per key regardless of input size
    * (exact when per-partition distinct keys stay under `cap`; raise
    * `cap` for heavy-hitter accuracy — the space-saving trade-off).
    */
  class TopKByCount[I](k: Int, kv: I => (String, Long), cap: Int = 4096)
    extends Aggregator[I, mutable.Map[String, Long], Seq[(String, Long)]] {
    def zero: mutable.Map[String, Long] = mutable.Map.empty
    private def compact(b: mutable.Map[String, Long]): mutable.Map[String, Long] =
      if (b.size <= cap) b
      else mutable.Map.from(b.toSeq.sortBy { case (w, n) => (-n, w) }.take(cap))
    def reduce(b: mutable.Map[String, Long], in: I): mutable.Map[String, Long] = {
      val (w, n) = kv(in); b.update(w, b.getOrElse(w, 0L) + n); compact(b)
    }
    def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      b.foreach { case (kk, v) => a.update(kk, a.getOrElse(kk, 0L) + v) }; compact(a)
    }
    def finish(b: mutable.Map[String, Long]): Seq[(String, Long)] =
      b.toSeq.sortBy { case (w, n) => (-n, w) }.take(k)
    def bufferEncoder: Encoder[mutable.Map[String, Long]] =
      Encoders.kryo[mutable.Map[String, Long]]
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Count-Min sketch over long keys: a depth×width counter matrix;
    * `reduce` adds 1 to one bucket per row, `merge` is an elementwise
    * sum. Merges are COMMUTATIVE AND ASSOCIATIVE, so the final sketch —
    * and every estimate read from it — is partition-order independent
    * and can be value-gated directly (contrast Misra-Gries below,
    * whose surviving candidate SET depends on merge order — a05 gates
    * it through its order-independent error bound instead). Buffer is
    * depth×width longs regardless of input size: the shuffle carries
    * one ~4 KB array per task — the sketch point at 100 TB.
    *
    * Estimates: est(k) = min over rows r of bucket(r, h_r(k)); CMS
    * guarantees est ≥ true always, and est ≤ true + colliding mass
    * (≈ n/width per row in expectation, min over `depth` rows).
    * Bucket hashing is the public splitmix64 finalizer seeded per row.
    */
  class CountMinSketch[I](key: I => Long, val depth: Int = 4, val width: Int = 64)
    extends Aggregator[I, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](depth * width)
    def reduce(b: Array[Long], in: I): Array[Long] = {
      val k = key(in)
      var r = 0
      while (r < depth) {
        b(r * width + CountMinSketch.bucket(k, r, width)) += 1L
        r += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  }

  /** Misra–Gries frequent-items summary: at most k live counters.
    * Per item: increment if tracked, insert if room, else decrement
    * EVERY counter (dropping zeros). Merge (Agarwal et al., mergeable
    * summaries): add counters, then subtract the (k+1)-th largest
    * count and drop non-positives. Deterministic GUARANTEE regardless
    * of stream/partition order: true − n/(k+1) ≤ est ≤ true — the
    * summary's CONTENTS may differ by order (hence the a05 gate
    * reports exact counts + replayed contract booleans, a03's
    * pattern), the bound never does. Distinct role from CMS: fixed k
    * counters, deterministic under-count (CMS over-counts), no
    * hashing at all.
    */
  class MisraGries[I](key: I => String, val k: Int)
    extends Aggregator[I, mutable.Map[String, Long], Map[String, Long]] {
    def zero: mutable.Map[String, Long] = mutable.Map.empty
    def reduce(b: mutable.Map[String, Long], in: I): mutable.Map[String, Long] = {
      val x = key(in)
      if (b.contains(x)) b(x) += 1L
      else if (b.size < k) b(x) = 1L
      else {
        // snapshot before rewriting: mutating a map mid-iteration is
        // undefined for mutable.HashMap
        val kept = b.toList.map { case (kk, v) => (kk, v - 1L) }
          .filter(_._2 > 0L)
        b.clear()
        kept.foreach { case (kk, v) => b(kk) = v }
      }
      b
    }
    def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      b.foreach { case (kk, v) => a(kk) = a.getOrElse(kk, 0L) + v }
      if (a.size > k) {
        val cut = a.values.toArray.sorted(Ordering.Long.reverse).apply(k)
        val kept = a.toList.map { case (kk, v) => (kk, v - cut) }
          .filter(_._2 > 0L)
        a.clear()
        kept.foreach { case (kk, v) => a(kk) = v }
      }
      a
    }
    def finish(b: mutable.Map[String, Long]): Map[String, Long] = b.toMap
    def bufferEncoder: Encoder[mutable.Map[String, Long]] =
      Encoders.kryo[mutable.Map[String, Long]]
    // file convention: kryo for buffers, ExpressionEncoder for outputs
    // (a typed MapType column, not an opaque binary blob)
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  object CountMinSketch {
    /** splitmix64 finalizer (public-domain constants), row-seeded. */
    def bucket(k: Long, row: Int, width: Int): Int = {
      var z = k + row.toLong * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= (z >>> 31)
      (((z % width) + width) % width).toInt
    }
    /** Point estimate from a finished sketch. */
    def estimate(sketch: Array[Long], k: Long, depth: Int, width: Int): Long = {
      var m = Long.MaxValue
      var r = 0
      while (r < depth) {
        val v = sketch(r * width + bucket(k, r, width))
        if (v < m) m = v
        r += 1
      }
      m
    }
  }
}
