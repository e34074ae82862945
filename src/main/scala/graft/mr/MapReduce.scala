package graft.mr

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD

import scala.collection.immutable.ListMap
import scala.reflect.ClassTag

/** Raised on the untyped surface when a record does not have 2 or 3
  * elements — the reference's only schema check
  * (`/root/reference/tinymr.py:273-275,301-308`). On the typed surface
  * the [[Emit]] ADT makes bad arity unrepresentable (SURVEY.md §7.1).
  */
class ElementCountError(msg: String) extends RuntimeException(msg)

/** One mapper/reducer emission — the reference's 2-tuple `(key, value)`
  * or 3-tuple `(key, sort, value)` intermediate record
  * (`/root/reference/tinymr.py:52-56,79-83`; `docs.rst:289-291`). The
  * sort element is transient: stripped before the reducer sees data
  * (`tinymr.py:313-314`).
  */
sealed trait Emit[+K, +S, +V] extends Serializable {
  def key: K
  def value: V
  def sortOpt: Option[S]
}
final case class KV[K, V](key: K, value: V) extends Emit[K, Nothing, V] {
  def sortOpt: Option[Nothing] = None
}
final case class KSV[K, S, V](key: K, sort: S, value: V) extends Emit[K, S, V] {
  def sortOpt: Option[S] = Some(sort)
}

/** Layer A — the reference's execution contract, distributed.
  *
  * tinymr's pipeline (`/root/reference/tinymr.py:156-230`) is
  * `mapper → partition+sort → reducer → partition+sort → collapse →
  * output`. Here each stage maps onto Spark's native machinery:
  *
  *   - map phase → `rdd.flatMap` (tinymr.py:196-199; the return-vs-yield
  *     dichotomy of the Python API unifies on `IterableOnce`, SURVEY §7.4)
  *   - partition + secondary sort → `repartitionAndSortWithinPartitions`
  *     with a composite (key, sortKey) ordering and a partitioner that
  *     hashes only the key — the shuffle's ExternalSorter sorts and can
  *     SPILL, unlike the reference's driver-resident
  *     `defaultdict(list)` + `list.sort` (tinymr.py:332-343) which is
  *     the single-machine wall this build removes
  *   - reduce phase → streaming per-key iterators inside
  *     `mapPartitions` — values of one key never need to fit in a
  *     driver, only in one task
  *   - second shuffle round with independent flags (tinymr.py:217-221)
  *   - first-per-key collapse for return-style reducers
  *     (tinymr.py:223-227) → `runCollapsed`
  *   - `output` driver hook (tinymr.py:93-114,230) → [[apply]]; at
  *     100 TB use [[run]] / [[runCollapsed]] which stay distributed.
  *
  * Sort-mode matrix (normative spec `docs.rst:300-307`, SURVEY §2.1):
  * per-record, `KV` + `sort*WithValue=false` → no sort (arrival order);
  * `KV` + true → sort by value; `KSV` + false → sort element only;
  * `KSV` + true → (sort, value).
  *
  * Decided divergences (SURVEY §7.4): arrival order and unsorted
  * first-per-key are only deterministic under [[stable]] (which pays one
  * `zipWithIndex` pass to add an arrival-index tiebreaker — Python's
  * Timsort stability reproduced at cluster scale); empty input returns
  * an empty result instead of leaking `StopIteration` (tinymr.py:302).
  */
abstract class MapReduce[I, K: ClassTag: Ordering, S: ClassTag: Ordering,
    V: ClassTag: Ordering] extends Serializable {

  /** Map contract (`tinymr.py:39-59`): 0..n emissions per item; 0 =
    * filter, n = explode. */
  def mapper(item: I): IterableOnce[Emit[K, S, V]]

  /** Reduce contract (`tinymr.py:61-91`): values arrive sorted per the
    * map-side sort mode; the sort element has been stripped. The
    * iterator streams — do not retain it past the call. */
  def reducer(key: K, values: Iterator[V]): IterableOnce[Emit[K, S, V]]

  /** Sort-direction / with-value flags (`tinymr.py:116-154`). */
  def sortMapWithValue: Boolean = false
  def sortReduceWithValue: Boolean = false
  def sortMapReverse: Boolean = false
  def sortReduceReverse: Boolean = false

  /** Reproduce Python's stable sort + insertion order exactly, at the
    * cost of a `zipWithIndex` pass per shuffle (SURVEY §7.4.3). */
  def stable: Boolean = false

  /** Reduce-side parallelism; defaults to the input's partition count
    * (the reference's analogue: pool size, `docs.rst:355-358`). */
  def numPartitions: Option[Int] = None

  /** Driver-side finalization hook (`tinymr.py:93-114`): "Anything!".
    * Identity by default. Only called from [[apply]]; the distributed
    * entry points never invoke it. */
  def output(results: ListMap[K, Seq[V]]): Any = results

  // ---------------------------------------------------------------------

  private def parts(rdd: RDD[_]): Int =
    numPartitions.getOrElse(math.max(rdd.getNumPartitions, 1))

  /** One partition+secondary-sort round (`tinymr.py:278-345`,
    * distributed). Emits per-key streaming iterators grouped from a
    * shuffle sorted on (key, sortKey[, arrivalIdx]).
    */
  private def shuffle(emits: RDD[Emit[K, S, V]], withValue: Boolean,
      reverse: Boolean, n: Int): RDD[(K, Iterator[V])] = {
    val kOrd = implicitly[Ordering[K]]
    val sOrd = implicitly[Ordering[S]]
    val vOrd = implicitly[Ordering[V]]

    // Composite sort key: (Option[S] sort element, Option[V] value) —
    // None sorts first, matching "absent" (never compared against Some
    // in a homogeneous stream, which is the only defined behavior:
    // mixed-arity streams are UB in the reference too [SURVEY §1.2]).
    val sortPart: Ordering[(Option[S], Option[V])] = {
      implicit val so: Ordering[Option[S]] = Ordering.Option(sOrd)
      implicit val vo: Ordering[Option[V]] = Ordering.Option(vOrd)
      Ordering.Tuple2(so, vo)
    }
    val dir = if (reverse) sortPart.reverse else sortPart

    val indexed: RDD[(Emit[K, S, V], Long)] =
      if (stable) emits.zipWithIndex()
      else emits.map(e => (e, 0L))

    type CK = (K, (Option[S], Option[V]), Long) // key, sortKey, arrival
    val keyed: RDD[(CK, V)] = indexed.map { case (e, idx) =>
      val sk = (e.sortOpt, if (withValue) Some(e.value) else None)
      ((e.key, sk, idx), e.value)
    }
    val partitioner = new HashPartitioner(n) {
      override def getPartition(key: Any): Int =
        super.getPartition(key.asInstanceOf[CK]._1)
    }
    implicit val ck: Ordering[CK] = new Ordering[CK] {
      def compare(a: CK, b: CK): Int = {
        val c1 = kOrd.compare(a._1, b._1)
        if (c1 != 0) return c1
        val c2 = dir.compare(a._2, b._2)
        if (c2 != 0) return c2
        java.lang.Long.compare(a._3, b._3) // arrival tiebreak (stable)
      }
    }
    keyed.repartitionAndSortWithinPartitions(partitioner)
      .mapPartitions({ it =>
        groupConsecutive(it.map { case ((k, _, _), v) => (k, v) })(kOrd)
      }, preservesPartitioning = true)
  }

  /** Group a key-sorted record iterator into per-key value iterators
    * without materializing a partition. The inner iterator must be
    * consumed (or abandoned) before the outer advances — guaranteed by
    * construction here since we drain leftovers on advance.
    */
  private def groupConsecutive(it: Iterator[(K, V)])(
      kOrd: Ordering[K]): Iterator[(K, Iterator[V])] =
    new Iterator[(K, Iterator[V])] {
      private val buf = it.buffered
      private var current: Iterator[V] = Iterator.empty
      def hasNext: Boolean = { while (current.hasNext) current.next(); buf.hasNext }
      def next(): (K, Iterator[V]) = {
        while (current.hasNext) current.next()
        val k = buf.head._1
        current = new Iterator[V] {
          def hasNext: Boolean = buf.hasNext && kOrd.equiv(buf.head._1, k)
          def next(): V = buf.next()._2
        }
        (k, current)
      }
    }

  /** Full pipeline, yield-style result: every value per output key,
    * ordered by the reduce-side sort mode. Fully distributed — the
    * 100 TB entry point (`.saveAs.../.toDF` downstream).
    */
  final def run(rdd: RDD[I]): RDD[(K, Seq[V])] =
    secondRound(rdd).mapPartitions(
      _.map { case (k, vs) => (k, vs.toVector) }, preservesPartitioning = true)

  /** Return-style collapse (`tinymr.py:223-227` [verified]): FIRST value
    * per key after the reduce-side sort — with a sort element this is
    * arg-min/arg-max; unsorted it is only deterministic under [[stable]].
    */
  final def runCollapsed(rdd: RDD[I]): RDD[(K, V)] =
    secondRound(rdd).mapPartitions(
      _.map { case (k, vs) => (k, vs.next()) }, preservesPartitioning = true)

  private def secondRound(rdd: RDD[I]): RDD[(K, Iterator[V])] = {
    val n = parts(rdd)
    val mapped: RDD[Emit[K, S, V]] = rdd.flatMap(mapper)
    val grouped = shuffle(mapped, sortMapWithValue, sortMapReverse, n)
    val reduced: RDD[Emit[K, S, V]] =
      grouped.mapPartitions(_.flatMap { case (k, vs) => reducer(k, vs) })
    shuffle(reduced, sortReduceWithValue, sortReduceReverse, n)
  }

  /** The reference's eager `__call__` (`tinymr.py:156-230`): run,
    * collect to a driver map (insertion order = reduce-output key
    * order), apply [[output]]. Test/driver-scale only.
    */
  final def apply(rdd: RDD[I]): Any =
    output(ListMap.from(run(rdd).collect()))

  /** Distributed finalization (SURVEY §7.4.6): the 100 TB counterpart
    * of the driver-side [[output]] hook — results go to a columnar (or
    * text) sink as (key, value) rows without ever touching the driver.
    * `format`/`options` pass straight to the DataFrameWriter, so Layer
    * A jobs finalize to any connector Layer B reads (parquet default;
    * CSV/JSON/ORC round-trips are spec-asserted). The `text` writer is
    * the one exception: it requires a SINGLE string column, so callers
    * must pre-concatenate (key, value) in `output`/a mapper before a
    * text-format write — passing format="text" on the two-column frame
    * fails at runtime by Spark's own contract. Requires Encoders for K
    * and V via the caller's SparkSession.
    */
  final def write(spark: org.apache.spark.sql.SparkSession, rdd: RDD[I],
      path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty)(implicit
      ke: org.apache.spark.sql.Encoder[K],
      ve: org.apache.spark.sql.Encoder[V]): Unit = {
    implicit val tupleEnc: org.apache.spark.sql.Encoder[(K, V)] =
      org.apache.spark.sql.Encoders.tuple(ke, ve)
    spark.createDataset(run(rdd).flatMap { case (k, vs) => vs.map((k, _)) })
      .toDF("key", "value")
      .write.mode("overwrite").format(format).options(options).save(path)
  }
}

/** Untyped row surface preserving the reference's runtime arity check
  * (O14): records are `Seq[Any]` of length 2 `(key, value)` or 3
  * `(key, sort, value)`; anything else raises [[ElementCountError]]
  * exactly as `tinymr.py:301-308` does. Typed jobs should prefer
  * [[MapReduce]], where the check is the compiler's.
  */
object UntypedEmit {
  def validate(rec: Seq[Any]): Emit[Any, Any, Any] = rec match {
    case Seq(k, v) => KV(k, v)
    case Seq(k, s, v) => KSV(k, s, v)
    case other => throw new ElementCountError(
      s"Record must have 2 or 3 elements, got ${other.length}")
  }

  /** Natural ordering over runtime Comparables — heterogeneous or
    * non-comparable sort elements fail at sort time, mirroring the
    * reference's `TypeError` (`tinymr.py:337-343` [verified]).
    */
  implicit object AnyOrdering extends Ordering[Any] {
    @SuppressWarnings(Array("unchecked"))
    def compare(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
  }
}

/** The reference's dynamically-typed surface end-to-end: mapper and
  * reducer emit raw `Seq[Any]` records; every record passes the arity
  * check ([[UntypedEmit.validate]]) exactly where the reference checks
  * (after map and after reduce, `tinymr.py:202-205,217-221`) — except
  * distributed, so EVERY record is checked, not just the first
  * (strictly stronger than the reference's first-record peek,
  * SURVEY §1.2).
  */
abstract class UntypedMapReduce
  extends MapReduce[Seq[Any], Any, Any, Any]()(
    scala.reflect.ClassTag.Any, UntypedEmit.AnyOrdering,
    scala.reflect.ClassTag.Any, UntypedEmit.AnyOrdering,
    scala.reflect.ClassTag.Any, UntypedEmit.AnyOrdering) {

  def rawMapper(item: Seq[Any]): IterableOnce[Seq[Any]]
  def rawReducer(key: Any, values: Iterator[Any]): IterableOnce[Seq[Any]]

  final def mapper(item: Seq[Any]): IterableOnce[Emit[Any, Any, Any]] =
    rawMapper(item).iterator.map(UntypedEmit.validate)
  final def reducer(key: Any, values: Iterator[Any]): IterableOnce[Emit[Any, Any, Any]] =
    rawReducer(key, values).iterator.map(UntypedEmit.validate)
}
