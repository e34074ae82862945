package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Aggregators.CountMinSketch

/** Property tests for the sketch/aggregation laws the oracle gate
  * RELIES on but cannot itself check: a03's correctness argument is
  * "merges are commutative+associative, therefore the estimate is
  * partition-order independent" — these pin that algebra over many
  * random streams and splits, driver-side (no Spark session: the laws
  * are about the buffer math, not the plumbing). Seeded RNG, so a
  * failure is reproducible.
  */
class SketchLawsSpec extends AnyFunSuite {

  private val depth = 4
  private val width = 64
  private def cms = new CountMinSketch[Long](identity, depth, width)

  private def sketchOf(xs: Seq[Long]): Array[Long] =
    xs.foldLeft(cms.zero)((b, x) => cms.reduce(b, x))

  private val rnd = new scala.util.Random(42)
  private def stream(): List[Long] =
    List.fill(rnd.nextInt(200))(
      if (rnd.nextBoolean()) rnd.nextLong() else rnd.nextInt(8).toLong)

  test("merge is commutative and associative (partition-order independence)") {
    (1 to 100).foreach { _ =>
      val (xs, ys, zs) = (stream(), stream(), stream())
      assert(cms.merge(sketchOf(xs), sketchOf(ys)).toSeq ==
        cms.merge(sketchOf(ys), sketchOf(xs)).toSeq)
      val l = cms.merge(cms.merge(sketchOf(xs), sketchOf(ys)), sketchOf(zs))
      val r = cms.merge(sketchOf(xs), cms.merge(sketchOf(ys), sketchOf(zs)))
      assert(l.toSeq == r.toSeq)
    }
  }

  test("any split of a stream sketches identically to the whole") {
    (1 to 100).foreach { _ =>
      val xs = stream()
      val k = if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1)
      val (l, r) = xs.splitAt(k)
      assert(cms.merge(sketchOf(l), sketchOf(r)).toSeq == sketchOf(xs).toSeq)
    }
  }

  test("estimates never under-count, never exceed total mass") {
    (1 to 100).foreach { _ =>
      val xs = stream()
      val sk = sketchOf(xs)
      xs.groupBy(identity).foreach { case (k, occ) =>
        val est = CountMinSketch.estimate(sk, k, depth, width)
        assert(est >= occ.size.toLong, s"under-count for key $k")
        assert(est <= xs.length.toLong, s"estimate exceeds stream mass for $k")
      }
    }
  }

  test("Misra-Gries bound survives every split/merge order (a05's contract)") {
    import graft.functions.Aggregators.MisraGries
    val k = 7
    val mg = new MisraGries[String](identity, k)
    def summarize(xs: Seq[String]) =
      xs.foldLeft(mg.zero)((b, x) => mg.reduce(b, x))
    (1 to 100).foreach { _ =>
      // skewed keys so some survive and some are evicted
      val xs = List.fill(50 + rnd.nextInt(300))(
        "k" + (if (rnd.nextInt(10) < 6) 0 else rnd.nextInt(20)))
      // arbitrary 3-way split, merged in a random order
      val i = rnd.nextInt(xs.length + 1); val j = i + rnd.nextInt(xs.length - i + 1)
      val parts = new scala.util.Random(rnd.nextLong())
        .shuffle(List(xs.slice(0, i), xs.slice(i, j), xs.slice(j, xs.length)))
      val merged = mg.finish(parts.map(summarize)
        .reduce((a, b) => mg.merge(a, b)))
      assert(merged.size <= k, "summary exceeded its k counters")
      val bound = xs.length.toLong / (k + 1)
      xs.groupBy(identity).foreach { case (key, occ) =>
        val est = merged.getOrElse(key, 0L)
        assert(est <= occ.size.toLong, s"over-count for $key")
        assert(occ.size.toLong - est <= bound,
          s"bound violated for $key: exact ${occ.size}, est $est, n/(k+1) $bound")
      }
    }
  }
}
