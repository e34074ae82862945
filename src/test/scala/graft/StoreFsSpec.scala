package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Failure-injecting, call-counting local FileSystem for the store
  * machinery specs. Registered under test schemes (`graftfs:`, and as
  * a stand-in `s3a:` for the scheme guard) via the session Hadoop
  * conf; all data lands on the real local disk, so Spark's parquet
  * reader/writer runs unmodified while the spec observes every
  * metadata call and can make any swap step fail — turning
  * rewriteStore's crash-safety claims from code-reading into injected
  * failures (a VERDICT r10 ask).
  */
class GraftTestFs extends RawLocalFileSystem {
  // RawLocalFileSystem's constructor calls getUri() before Scala
  // field initializers run — keep the override null-tolerant
  private var myScheme: String = null
  override def initialize(name: java.net.URI, conf: Configuration): Unit = {
    myScheme = name.getScheme
    super.initialize(name, conf)
  }
  override def getUri: java.net.URI =
    java.net.URI.create((if (myScheme == null) "graftfs" else myScheme) + ":///")
  // RawLocalFileSystem statuses load permissions LAZILY via
  // `new java.io.File(path.toUri)`, which rejects non-file schemes —
  // return plain, fully-materialized copies instead
  private def solid(s: FileStatus): FileStatus = new FileStatus(
    s.getLen, s.isDirectory, s.getReplication.toInt, s.getBlockSize,
    s.getModificationTime, s.getAccessTime, null, null, null, s.getPath)
  override def listStatus(f: Path): Array[FileStatus] = {
    GraftTestFs.record("list", f)
    if (GraftTestFs.failListUnder != null &&
        f.toString.contains(GraftTestFs.failListUnder))
      // persistent: models a broken store (dead ACL, corrupt dir)
      throw new java.io.IOException(s"injected persistent list failure: $f")
    if (GraftTestFs.failListOnce != null &&
        f.toString.contains(GraftTestFs.failListOnce)) {
      // self-clearing: models a TRANSIENT hiccup — the very next
      // listing of the same path succeeds
      GraftTestFs.failListOnce = null
      throw new java.io.IOException(s"injected transient list failure: $f")
    }
    super.listStatus(f).map(solid)
  }
  override def getFileStatus(f: Path): FileStatus = {
    GraftTestFs.record("stat", f)
    solid(super.getFileStatus(f))
  }
  override def rename(src: Path, dst: Path): Boolean = {
    GraftTestFs.record("rename", src)
    if (GraftTestFs.failRenameDstSuffix != null &&
        dst.toString.endsWith(GraftTestFs.failRenameDstSuffix)) false
    else if (GraftTestFs.failRenameSrcSuffix != null &&
        src.toString.endsWith(GraftTestFs.failRenameSrcSuffix)) false
    else super.rename(src, dst)
  }
  override def delete(f: Path, recursive: Boolean): Boolean = {
    GraftTestFs.record("delete", f)
    if (GraftTestFs.failDeleteSuffix != null &&
        f.toString.endsWith(GraftTestFs.failDeleteSuffix)) false
    else super.delete(f, recursive)
  }
  // the one funnel both public create() overloads reach — injecting
  // here fails the parquet task write itself, not just the commit
  override protected def createOutputStreamWithMode(f: Path, append: Boolean,
      permission: org.apache.hadoop.fs.permission.FsPermission): java.io.OutputStream = {
    if (GraftTestFs.failCreateUnder != null &&
        f.toString.contains(GraftTestFs.failCreateUnder))
      throw new java.io.IOException(s"injected create failure: $f")
    super.createOutputStreamWithMode(f, append, permission)
  }
  // graftfs advertises the swap guard's atomic-rename capability (it
  // IS local-rename-backed); any other scheme this class serves (the
  // unlisted `graftns` stand-in) makes no claim — exercising both
  // sides of the capability probe
  override def hasPathCapability(path: Path, capability: String): Boolean =
    if (capability == graft.streaming.EventStreams.AtomicRenameCapability)
      myScheme == null || myScheme == "graftfs"
    else super.hasPathCapability(path, capability)
}

object GraftTestFs {
  @volatile var failRenameDstSuffix: String = null
  @volatile var failRenameSrcSuffix: String = null
  @volatile var failDeleteSuffix: String = null
  @volatile var failCreateUnder: String = null
  @volatile var failListOnce: String = null
  @volatile var failListUnder: String = null
  private val ops = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  def record(op: String, p: Path): Unit = { ops.add((op, p.toString)); () }
  /** list+stat calls whose path contains `fragment`. */
  def metadataCalls(fragment: String): Int = {
    val it = ops.iterator(); var n = 0
    while (it.hasNext) {
      val (op, p) = it.next()
      if ((op == "list" || op == "stat") && p.contains(fragment)) n += 1
    }
    n
  }
  def reset(): Unit = {
    ops.clear()
    failRenameDstSuffix = null; failRenameSrcSuffix = null
    failDeleteSuffix = null; failCreateUnder = null
    failListOnce = null; failListUnder = null
  }
}

/** StoreCensus (the catalog-backed store file index) and
  * rewriteStore's swap, specified the hard way:
  *
  *  - census reads answer EXACTLY what a cold `spark.read.parquet`
  *    answers, across appends, a compaction swap, and a tombstone
  *    fold (the mutation-contract equivalence);
  *  - a census-served probe frame performs ZERO filesystem metadata
  *    calls on the store (counted by GraftTestFs, with a positive
  *    control proving the counter sees cold reads);
  *  - the swap stays data-safe under an injected failure at EVERY
  *    step — stale-cleanup delete, tmp write, rename-aside, promote
  *    (with rollback), delete-last — the store remains readable with
  *    either the old or the new content, never half of one;
  *  - a non-atomic-rename scheme (s3a) is refused loudly unless the
  *    deployment opts in by conf.
  */
class StoreFsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val sp = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // test schemes, installed at runtime so an already-running shared
    // session picks them up too: graftfs = counting/failing local FS;
    // s3a = the same class standing in for an object store, so the
    // scheme guard can fire without any real object-store connector
    sp.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    sp.sparkContext.hadoopConfiguration
      .set("fs.s3a.impl", classOf[GraftTestFs].getName)
    // graftns: an UNLISTED scheme that advertises nothing — the
    // fail-safe side of the swap guard's capability probe
    sp.sparkContext.hadoopConfiguration
      .set("fs.graftns.impl", classOf[GraftTestFs].getName)
    sp
  }
  import graft.streaming.{EventStreams => ES, StoreCensus}

  override def afterAll(): Unit = { GraftTestFs.reset() }

  private def tmpDir(prefix: String): String =
    graft.core.Staging.tempAtExit(prefix)

  /** A tiny batch of documents shaped for st21Batch (doc_id, text)
    * with enough repeated shingle content to produce signatures. */
  private def docBatch(ids: Range): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong,
      s"the quick brown fox jumps over the lazy dog number ${i % 3} " +
        "and the shared boilerplate tail keeps chunk signatures stable " * 4))
      .toDF("doc_id", "text")
  }

  /** Live (census-free) twin of storeNonEmpty/maxFilesPerBucket,
    * computed with raw java.nio so the spec never trusts the code
    * under test. Local paths only. */
  private def liveFiles(dir: String): Seq[java.nio.file.Path] = {
    val root = java.nio.file.Paths.get(dir.stripPrefix("graftfs:"))
    if (!java.nio.file.Files.exists(root)) Seq.empty
    else {
      val s = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p =>
          p.getFileName.toString.startsWith("part-")).toList
      } finally s.close()
    }
  }

  test("census read == cold read across appends, compaction, and a tombstone fold") {
    graft.functions.VectorExpressions.register(spark)
    val store = tmpDir("graft_censeq_sigs_")
    val pairs = tmpDir("graft_censeq_pairs_")
    // 10 batches: crosses the compaction threshold (8), so the series
    // exercises append-refresh AND the swap-refresh path mid-run
    (0 until 10).foreach { i =>
      ES.st21Batch(docBatch(i * 20 until (i + 1) * 20), store, pairs)
      val census = StoreCensus.read(spark, store).collect().toSet
      val cold = spark.read.parquet(store).collect().toSet
      assert(census == cold, s"census/cold divergence after batch $i")
      assert(ES.storeNonEmpty(store) == liveFiles(store).nonEmpty)
      val liveMax = liveFiles(store).groupBy(_.getParent).values
        .map(_.size).foldLeft(0)(math.max)
      assert(ES.maxFilesPerBucket(store) == liveMax,
        s"census files/bucket ${ES.maxFilesPerBucket(store)} != live $liveMax")
    }
    // schema must match the cold read's exactly (column order included)
    assert(StoreCensus.read(spark, store).schema ==
      spark.read.parquet(store).schema)
    // tombstone fold: delete a slice, census must track the swap
    import spark.implicits._
    ES.deleteFromStore(spark, store, "doc_id",
      (0L until 200L by 7L).toDF("doc_id"))
    val census = StoreCensus.read(spark, store).collect().toSet
    val cold = spark.read.parquet(store).collect().toSet
    assert(census == cold, "census/cold divergence after tombstone fold")
    assert(ES.maxFilesPerBucket(store) == 1, "fold must reset files/bucket")
    // the HDFS-locality refresh variant (listLocatedStatus) must build
    // an identical census
    spark.conf.set("spark.graft.storeCensus.locatedStatus", "true")
    try {
      StoreCensus.refresh(spark, store)
      assert(StoreCensus.read(spark, store).collect().toSet == cold,
        "locatedStatus refresh must census the same files")
    } finally spark.conf.unset("spark.graft.storeCensus.locatedStatus")
  }

  test("a census-served probe frame makes zero store metadata calls (cold read as positive control)") {
    graft.functions.VectorExpressions.register(spark)
    val local = tmpDir("graft_cens0_sigs_")
    val store = "graftfs:" + local
    val pairs = "graftfs:" + tmpDir("graft_cens0_pairs_")
    ES.st21Batch(docBatch(0 until 30), store, pairs)
    ES.st21Batch(docBatch(30 until 60), store, pairs)
    // census-served: frame creation (listing + schema resolution in
    // the raw path) must touch the filesystem zero times
    GraftTestFs.reset()
    val frame = ES.prunedStore(spark, store, 0 until 16)
    assert(GraftTestFs.metadataCalls(local) == 0,
      s"census read listed the store: ${GraftTestFs.metadataCalls(local)} calls")
    // ... and still answers correctly (the scan itself may open files)
    val rows = frame.count()
    // positive control: the same frame cold (census dropped) MUST list
    StoreCensus.invalidate(store)
    GraftTestFs.reset()
    val coldFrame = ES.prunedStore(spark, store, 0 until 16)
    assert(GraftTestFs.metadataCalls(local) > 0,
      "counter failed to observe a cold read — the zero above proves nothing")
    assert(coldFrame.count() == rows)
    // storeNonEmpty/maxFilesPerBucket: fallbacks list, census doesn't
    StoreCensus.refresh(spark, store)
    GraftTestFs.reset()
    ES.storeNonEmpty(store); ES.maxFilesPerBucket(store)
    assert(GraftTestFs.metadataCalls(local) == 0,
      "census-tracked emptiness/file-count probes must not list")
  }

  test("a census-served probe frame still partition-prunes to the probed buckets") {
    import spark.implicits._
    val dir = tmpDir("graft_censprune_")
    (0 until 4).foreach { b =>
      (b * 4000 until (b + 1) * 4000).toDF("k")
        .withColumn("bucket", ES.bucketOf(col("k")))
        .write.partitionBy("bucket").mode("append").parquet(dir)
    }
    // track the store — from here every read is the census relation
    // (HadoopFsRelation over the pinned index), and the economics
    // claim must survive the swap of file-index implementations:
    // the bucket IN-list lands in PartitionFilters and the scan
    // touches only the probed bucket dirs' files
    StoreCensus.refresh(spark, dir)
    val total = StoreCensus.lookup(dir).get.files.length
    val buckets = Seq(17).toDF("k")
      .select(ES.bucketOf(col("k")).as("bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val probe = ES.prunedStore(spark, dir, buckets)
    assert(probe.collect().length >= 1, "probed bucket must contain its key")
    val scans = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "census probe must be a file-source scan")
    val scanStr = scans.head.toString
    val pf = scanStr.substring(scanStr.indexOf("PartitionFilters: ["))
    assert(pf.take(pf.indexOf("]") + 1).contains("bucket#"),
      s"bucket IN-list must land in the census relation's PartitionFilters:\n" +
        scanStr.take(400))
    val scanned = scans.map(_.metrics("numFiles").value).sum
    assert(scanned > 0 && scanned * 10 < total,
      s"census probe must scan ~1/16 of the store, got $scanned of $total files")
  }

  /** Builds a small bucketed store on the graftfs scheme and returns
    * (storeDir, its rows) — the fixture every swap-failure case
    * starts from. */
  private def freshStore(tag: String): (String, Set[org.apache.spark.sql.Row]) = {
    import spark.implicits._
    val store = "graftfs:" + tmpDir(s"graft_swap_${tag}_")
    val df = (0L until 64L).map(i => (i, s"payload_$i"))
      .toDF("doc_id", "text")
      .withColumn("bucket", pmod(hash(col("doc_id")), lit(4)))
    df.repartition(4, col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(store)
    (store, spark.read.parquet(store).collect().toSet)
  }

  private def interceptSwapFailure(store: String)(inject: => Unit): Throwable = {
    import spark.implicits._
    inject
    val e = intercept[Throwable] {
      ES.rewriteStore(spark, store,
        spark.read.parquet(store).filter(col("doc_id") =!= 0L))
    }
    GraftTestFs.reset()
    e
  }

  test("swap survives an injected failure at every step (delete-stale, write, rename-aside, promote, delete-last)") {
    // (1) stale-cleanup delete fails: live store untouched
    locally {
      val (store, before) = freshStore("stale")
      // plant a stale .old so the cleanup delete actually runs
      val p = new Path(store + ".old")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
      val e = interceptSwapFailure(store) { GraftTestFs.failDeleteSuffix = ".old" }
      assert(e.getMessage.contains("failed to delete"), e.getMessage)
      assert(spark.read.parquet(store).collect().toSet == before)
    }
    // (2) tmp write fails (injected task IOException): live untouched
    locally {
      val (store, before) = freshStore("write")
      val e = interceptSwapFailure(store) {
        GraftTestFs.failCreateUnder = ".compacting"
      }
      assert(e.getMessage != null)
      assert(spark.read.parquet(store).collect().toSet == before)
    }
    // (3) rename-aside fails: live untouched
    locally {
      val (store, before) = freshStore("aside")
      val e = interceptSwapFailure(store) {
        GraftTestFs.failRenameDstSuffix = ".old"
      }
      assert(e.getMessage.contains("rename aside failed"), e.getMessage)
      assert(spark.read.parquet(store).collect().toSet == before)
    }
    // (4) promote fails: rollback restores the live store
    locally {
      val (store, before) = freshStore("promote")
      val e = interceptSwapFailure(store) {
        GraftTestFs.failRenameSrcSuffix = ".compacting"
      }
      assert(e.getMessage.contains("promote failed"), e.getMessage)
      assert(spark.read.parquet(store).collect().toSet == before)
    }
    // (5) delete-last fails: the swap has COMMITTED — new content is
    // live and complete; the .old tree is stale garbage, and the next
    // swap (switch cleared) cleans it and still works
    locally {
      import spark.implicits._
      val (store, before) = freshStore("last")
      val after = before.filterNot(_.getLong(0) == 0L)
      GraftTestFs.failDeleteSuffix = ".old"
      val e = intercept[Throwable] {
        ES.rewriteStore(spark, store,
          spark.read.parquet(store).filter(col("doc_id") =!= 0L))
      }
      GraftTestFs.reset()
      assert(e.getMessage.contains("failed to delete"), e.getMessage)
      assert(spark.read.parquet(store).collect().toSet == after,
        "delete-last failure must leave the NEW store live and complete")
      ES.rewriteStore(spark, store,
        spark.read.parquet(store).filter(col("doc_id") =!= 1L))
      assert(spark.read.parquet(store).collect().toSet ==
        after.filterNot(_.getLong(0) == 1L))
    }
  }

  test("failed swap invalidates the census (reads fall back, stay correct)") {
    val (store, before) = freshStore("cens")
    StoreCensus.refresh(spark, store)
    val e = interceptSwapFailure(store) {
      GraftTestFs.failRenameSrcSuffix = ".compacting"
    }
    assert(e.getMessage.contains("promote failed"))
    assert(StoreCensus.nonEmpty(store).isEmpty,
      "census must not survive a failed swap")
    assert(ES.storeNonEmpty(store)) // fallback path answers
    assert(StoreCensus.read(spark, store).collect().toSet == before)
  }

  test("census survives a driver restart: probe-only reads regain zero-listing from the second read on") {
    graft.functions.VectorExpressions.register(spark)
    val local = tmpDir("graft_censrec_sigs_")
    val store = "graftfs:" + local
    val pairs = "graftfs:" + tmpDir("graft_censrec_pairs_")
    ES.st21Batch(docBatch(0 until 30), store, pairs)
    ES.st21Batch(docBatch(30 until 60), store, pairs)
    val cold = spark.read.parquet(store).collect().toSet
    // simulated restart: entries are JVM memory and are gone
    StoreCensus.clearForTest()
    // first probe-only read pays the lazy rebuild — one marker stat +
    // one listing + one footer, the same price a mutation refresh pays
    GraftTestFs.reset()
    val first = ES.prunedStore(spark, store, 0 until 16)
    assert(GraftTestFs.metadataCalls(local) > 0,
      "first post-restart read must rebuild (marker stat + listing)")
    assert(first.collect().toSet == cold)
    // ...and from the second read on the census serves again: ZERO
    // filesystem calls — without recovery this would be the raw
    // per-probe listing tax forever (the r11 gap)
    GraftTestFs.reset()
    val second = ES.prunedStore(spark, store, 0 until 16)
    assert(GraftTestFs.metadataCalls(local) == 0,
      s"post-restart reads must be census-served again: " +
        s"${GraftTestFs.metadataCalls(local)} calls")
    assert(second.collect().toSet == cold)
    // an UNMARKED dir (external writer's store) keeps live-listing
    // semantics and pays at most one marker stat per JVM
    import spark.implicits._
    val ext = "graftfs:" + tmpDir("graft_censrec_ext_")
    (0L until 8L).toDF("doc_id").write.mode("overwrite").parquet(ext)
    assert(ES.storeNonEmpty(ext))
    assert(StoreCensus.nonEmpty(ext).isEmpty,
      "an unmarked external store must not be adopted by the census")
  }

  test("the restart marker survives a compaction swap (recovery stays armed after rewrites)") {
    import spark.implicits._
    val (store, before) = freshStore("marker_swap")
    StoreCensus.refresh(spark, store) // first refresh drops the marker
    val localRoot = store.stripPrefix("graftfs:")
    def markerOnDisk: Boolean = java.nio.file.Files.exists(
      java.nio.file.Paths.get(localRoot, StoreCensus.MarkerName))
    assert(markerOnDisk, "first refresh must drop the marker")
    // the swap renames the live dir aside (marker travels into .old and
    // is deleted with it) and promotes the rewritten tree — the
    // post-swap refresh must re-drop the marker or restart recovery
    // silently dies for every compacted store
    ES.rewriteStore(spark, store,
      spark.read.parquet(store).filter(col("doc_id") =!= 0L))
    assert(markerOnDisk, "post-swap refresh must re-drop the marker")
    StoreCensus.clearForTest() // simulated restart AFTER a compaction
    val cold = spark.read.parquet(store).collect().toSet
    assert(StoreCensus.read(spark, store).collect().toSet == cold)
    assert(StoreCensus.nonEmpty(store).contains(true),
      "recovery must have re-installed the entry")
    assert(cold == before.filterNot(_.getLong(0) == 0L))
  }

  test("refresh sequence gauge: strictly monotone per successful refresh, per store, -1 before the first (ADVICE r16)") {
    // StoreProbe's staleness guard keys on this sequence — the old
    // duration-compare could read two refreshes with identical nano
    // durations as "no refresh happened" and falsely record -1
    val (store, _) = freshStore("seq_gauge")
    assert(StoreCensus.lastRefreshSeq(store) == -1L,
      "untracked store must read -1")
    StoreCensus.refresh(spark, store)
    val s1 = StoreCensus.lastRefreshSeq(store)
    assert(s1 >= 0L)
    StoreCensus.refresh(spark, store)
    val s2 = StoreCensus.lastRefreshSeq(store)
    assert(s2 > s1,
      "a second refresh of the SAME unchanged store must still move the sequence")
    // per-store reads: another store's refresh never moves this one's
    val (other, _) = freshStore("seq_gauge_other")
    StoreCensus.refresh(spark, other)
    assert(StoreCensus.lastRefreshSeq(store) == s2)
    assert(StoreCensus.lastRefreshSeq(other) > s2,
      "the counter is global, so the other store's seq is newer")
  }

  test("docstring corollary pinned: out-of-band mutation of a tracked store is served stale until invalidate/refresh") {
    import spark.implicits._
    val (store, before) = freshStore("stale_corollary")
    StoreCensus.refresh(spark, store)
    // a non-census writer appends behind the census' back
    (100L until 116L).map(i => (i, s"ext_$i"))
      .toDF("doc_id", "text")
      .withColumn("bucket", pmod(hash(col("doc_id")), lit(4)))
      .write.partitionBy("bucket").mode("append").parquet(store)
    val censusRows = StoreCensus.read(spark, store).collect().toSet
    val coldRows = spark.read.parquet(store).collect().toSet
    assert(censusRows == before && coldRows.size > before.size,
      "a tracked store mutated out-of-band MUST be served stale — " +
        "this pins the documented hazard, not an aspiration")
    // the documented repair: route the mutation through the hooks
    StoreCensus.invalidate(store)
    assert(StoreCensus.read(spark, store).collect().toSet == coldRows,
      "after invalidate, reads must fall back to live state")
    StoreCensus.refresh(spark, store)
    assert(StoreCensus.read(spark, store).collect().toSet == coldRows)
  }

  test("schema-evolution fence: a widened append fails the refresh loudly and drops the census") {
    import spark.implicits._
    val (store, _) = freshStore("fence")
    StoreCensus.refresh(spark, store) // pins the (doc_id, text, bucket) schema
    // a future writer appends a WIDENED schema — serving the stale
    // pinned schema silently is the red case
    (200L until 208L).map(i => (i, s"w_$i", i * 2))
      .toDF("doc_id", "text", "extra_col")
      .withColumn("bucket", pmod(hash(col("doc_id")), lit(4)))
      .write.partitionBy("bucket").mode("append").parquet(store)
    val e = intercept[IllegalStateException] { StoreCensus.refresh(spark, store) }
    assert(e.getMessage.contains("schema drift") &&
      e.getMessage.contains("extra_col"), e.getMessage)
    assert(StoreCensus.nonEmpty(store).isEmpty,
      "a fence violation must invalidate the entry, not serve the stale schema")
    assert(ES.storeNonEmpty(store), "fallback paths must still answer")
  }

  test("a failed append invalidates the census (no stale pre-append snapshot for callers that catch and continue)") {
    graft.functions.VectorExpressions.register(spark)
    val local = tmpDir("graft_censfail_sigs_")
    val store = "graftfs:" + local
    val pairs = "graftfs:" + tmpDir("graft_censfail_pairs_")
    ES.st21Batch(docBatch(0 until 30), store, pairs)
    assert(StoreCensus.nonEmpty(store).contains(true))
    val preAppend = spark.read.parquet(store).collect().toSet
    // the sig-store append write fails mid-task; the sibling pair
    // write may have committed — the census must not keep serving the
    // pre-append snapshot to a caller that catches the batch failure
    GraftTestFs.failCreateUnder = "censfail_sigs"
    val e = intercept[Throwable] {
      ES.st21Batch(docBatch(30 until 60), store, pairs)
    }
    GraftTestFs.reset()
    assert(e.getMessage != null)
    assert(StoreCensus.nonEmpty(store).isEmpty,
      "census must not survive a failed append")
    // fallback reads answer the live on-disk state, whatever the
    // failed job left committed
    assert(StoreCensus.read(spark, store).collect().toSet ==
      spark.read.parquet(store).collect().toSet)
    // an append failure never loses pre-append rows
    assert(preAppend.subsetOf(spark.read.parquet(store).collect().toSet))
    // the next successful mutation re-installs the census
    ES.st21Batch(docBatch(60 until 90), store, pairs)
    assert(StoreCensus.nonEmpty(store).contains(true))
    assert(StoreCensus.read(spark, store).collect().toSet ==
      spark.read.parquet(store).collect().toSet)
  }

  test("unknown schemes without an atomic-rename capability claim are refused (fail-safe), a claim is honored") {
    import spark.implicits._
    val local = tmpDir("graft_ns_store_")
    val store = "graftns:" + local
    val df = (0L until 16L).map(i => (i, s"p$i")).toDF("doc_id", "text")
      .withColumn("bucket", pmod(hash(col("doc_id")), lit(4)))
    df.repartition(4, col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(store)
    // graftns is on NO list and advertises nothing → refused loudly
    val e = intercept[IllegalStateException] {
      ES.rewriteStore(spark, store, spark.read.parquet(store))
    }
    assert(e.getMessage.contains("atomic") &&
      e.getMessage.contains("allowNonAtomicRename") &&
      e.getMessage.contains(ES.AtomicRenameCapability), e.getMessage)
    // the same conf opt-in as the blocklist unblocks it
    spark.conf.set("spark.graft.store.allowNonAtomicRename", "true")
    try {
      val before = spark.read.parquet(store).collect().toSet
      ES.rewriteStore(spark, store,
        spark.read.parquet(store).filter(col("doc_id") =!= 0L))
      assert(spark.read.parquet(store).collect().toSet ==
        before.filterNot(_.getLong(0) == 0L))
    } finally spark.conf.unset("spark.graft.store.allowNonAtomicRename")
    // the capability claim (graftfs advertises it) takes the trusting
    // path — every swap-failure test above already rides it; assert
    // the guard explicitly here so the two sides sit together
    val (cstore, cbefore) = freshStore("cap_ok")
    ES.rewriteStore(spark, cstore,
      spark.read.parquet(cstore).filter(col("doc_id") =!= 0L))
    assert(spark.read.parquet(cstore).collect().toSet ==
      cbefore.filterNot(_.getLong(0) == 0L))
  }

  test("emptiness fallback: hidden components below the root hide files; a hidden-rooted store still answers") {
    import spark.implicits._
    // a store legitimately rooted under a dot-dir must not read empty
    val hiddenRoot = "/tmp/.graft_hidden_r12/store_" + System.nanoTime()
    (0L until 4L).toDF("doc_id").write.mode("overwrite").parquet(hiddenRoot)
    assert(ES.storeNonEmpty(hiddenRoot),
      "a store under a dot-dir must not be reported empty")
    // ...while an aborted job's _temporary leftovers below the root
    // must not make an otherwise-empty store read non-empty
    val ghost = tmpDir("graft_ghost_store_")
    val tmpTask = java.nio.file.Paths.get(ghost, "_temporary", "0")
    java.nio.file.Files.createDirectories(tmpTask)
    java.nio.file.Files.write(tmpTask.resolve("part-00000-ghost"),
      Array[Byte](1, 2, 3))
    assert(!ES.storeNonEmpty(ghost),
      "uncommitted _temporary task files must not count as store content")
    // and the census walk agrees: refresh sees no files either
    StoreCensus.refresh(spark, ghost)
    assert(StoreCensus.nonEmpty(ghost).contains(false),
      "census walk must skip hidden dirs exactly like the fallback")
  }

  /** Writes `df` as ONE parquet part file and moves it to
    * `target/name` with raw java.nio — an out-of-band writer the
    * census hooks never see, landing files the way a foreign tool
    * would. */
  private def plantPartFile(df: org.apache.spark.sql.DataFrame,
      target: java.nio.file.Path, name: String): Unit = {
    val stage = tmpDir("graft_plant_")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    java.nio.file.Files.createDirectories(target)
    java.nio.file.Files.move(liveFiles(stage).head, target.resolve(name))
    ()
  }

  test("schema fence footers EVERY new file — a mixed-schema multi-file append cannot slip on listing order") {
    import spark.implicits._
    val (store, _) = freshStore("fence_multi")
    StoreCensus.refresh(spark, store) // pins (doc_id, text, bucket)
    val b0 = java.nio.file.Paths.get(store.stripPrefix("graftfs:"), "bucket=0")
    // one CONFORMING new file (footer = the pinned data columns)...
    plantPartFile((900L to 903L).map(i => (i, s"ok_$i")).toDF("doc_id", "text"),
      b0, "part-00000-conforming.parquet")
    // ...and one WIDENED file in the SAME mutation window — under the
    // r12 first-found fence (mutation: `files.find` back in refresh)
    // this slipped whenever the conforming file happened to list
    // first, and "first" was filesystem-order luck
    plantPartFile((904L to 907L).map(i => (i, s"w_$i", i * 2))
        .toDF("doc_id", "text", "extra_col"),
      b0, "part-00001-widened.parquet")
    val e = intercept[IllegalStateException] { StoreCensus.refresh(spark, store) }
    assert(e.getMessage.contains("schema drift") &&
      e.getMessage.contains("extra_col"), e.getMessage)
    assert(StoreCensus.nonEmpty(store).isEmpty,
      "a fence violation must invalidate the entry")
    assert(ES.storeNonEmpty(store), "fallback paths must still answer")
  }

  test("schema fence tolerates a stray root-level part file carrying the pinned DATA columns (widened root files still fire)") {
    import spark.implicits._
    val (store, _) = freshStore("fence_root")
    StoreCensus.refresh(spark, store)
    val root = java.nio.file.Paths.get(store.stripPrefix("graftfs:"))
    val before = StoreCensus.lookup(store).get.files.length
    // r12's fence false-positived here: a root-level path carries no
    // k=v components, so `found` lacked `bucket` and a schema-exact
    // file failed as "drift" — inconsistent with maxFilesPerBucket,
    // which tolerates stray root files by design (ADVICE r12)
    plantPartFile((910L to 913L).map(i => (i, s"r_$i")).toDF("doc_id", "text"),
      root, "part-00000-stray-root.parquet")
    StoreCensus.refresh(spark, store) // must NOT throw
    assert(StoreCensus.lookup(store).get.files.length == before + 1,
      "the stray root file must be censused, not fenced out")
    // ...while an actually-widened root-level file is still drift
    plantPartFile((914L to 915L).map(i => (i, s"w_$i", i * 3))
        .toDF("doc_id", "text", "wide_col"),
      root, "part-00001-widened-root.parquet")
    val e = intercept[IllegalStateException] { StoreCensus.refresh(spark, store) }
    assert(e.getMessage.contains("schema drift") &&
      e.getMessage.contains("wide_col"), e.getMessage)
  }

  test("fence comparator laws: fires iff a non-path-explicable name OR type difference exists (seeded sweep)") {
    val pool = ('a' to 'j').map("c" + _)
    val rnd = new scala.util.Random(13)
    (1 to 500).foreach { _ =>
      val shuffled = rnd.shuffle(pool)
      val data = shuffled.take(1 + rnd.nextInt(6)).toSet
      val parts = rnd.shuffle(pool.filterNot(data)).take(rnd.nextInt(3)).toSet
      val pinned = data ++ parts
      val pinnedT = pinned.iterator.map(_ -> "bigint").toMap
      def fence(footer: Set[String], fileParts: Set[String]) =
        StoreCensus.fenceViolation(
          footer.toSeq.sorted.map(_ -> "bigint"), fileParts, parts, pinnedT)
      // a conforming bucket-dir file never fires
      assert(fence(data, parts).isEmpty)
      // a root-level file missing ONLY path-partition columns never fires
      assert(fence(data, Set.empty).isEmpty)
      val extra = pool.filterNot(pinned.contains).headOption
      extra.foreach { e =>
        // widened footer fires in both placements
        assert(fence(data + e, parts).nonEmpty)
        assert(fence(data + e, Set.empty).nonEmpty)
        // a NEW partition key appearing in the path fires
        assert(fence(data, parts + e).nonEmpty)
      }
      if (data.size > 1) {
        // dropped data column fires even at the root (absence of a
        // DATA column is never path-explicable)
        val dropped = data - data.head
        assert(fence(dropped, parts).nonEmpty)
        assert(fence(dropped, Set.empty).nonEmpty)
        // renamed data column (drop one, add one) fires
        extra.foreach(e => assert(fence(dropped + e, parts).nonEmpty))
      }
      // TYPE dimension (r14): a same-name retyped data column fires
      // in BOTH placements — the root tolerance is a NAME tolerance
      // and must never excuse a type change — and the message names
      // the offending column
      val retyped = data.head
      def fenceT(fileParts: Set[String]) = StoreCensus.fenceViolation(
        data.toSeq.sorted.map(n =>
          n -> (if (n == retyped) "double" else "bigint")),
        fileParts, parts, pinnedT)
      assert(fenceT(parts).exists(m =>
        m.contains(retyped) && m.contains("double") && m.contains("bigint")))
      assert(fenceT(Set.empty).nonEmpty)
      // a retype of a PATH partition column cannot be seen through a
      // footer (partition values live in the path); the name check
      // stays authoritative there — pinned-typed fields absent from
      // the footer are never type-checked
      assert(fence(data, parts).isEmpty)
    }
  }

  test("schema fence catches a same-name RETYPED append at the writer's refresh, not the reader's scan") {
    import spark.implicits._
    val (store, _) = freshStore("fence_retype")
    StoreCensus.refresh(spark, store) // pins doc_id BIGINT, text STRING
    val root = java.nio.file.Paths.get(store.stripPrefix("graftfs:"))
    val b0 = root.resolve("bucket=0")
    // same names, doc_id written as INT32 — r13's name-only fence let
    // this into the census and the failure surfaced later as a scan
    // decode error (mutation: drop fenceViolation's type pass — this
    // file conforms by name and the intercept below fails)
    plantPartFile((920 to 923).map(i => (i, s"rt_$i")).toDF("doc_id", "text"),
      b0, "part-00000-retyped.parquet")
    val e = intercept[IllegalStateException] { StoreCensus.refresh(spark, store) }
    assert(e.getMessage.contains("schema drift") &&
      e.getMessage.contains("`doc_id` as int ") &&
      e.getMessage.contains("has bigint"), e.getMessage)
    assert(StoreCensus.nonEmpty(store).isEmpty,
      "a type-drift violation must invalidate the entry")
    assert(ES.storeNonEmpty(store), "fallback paths must still answer")
    // the root-level NAME tolerance never excuses a retype either
    java.nio.file.Files.delete(b0.resolve("part-00000-retyped.parquet"))
    StoreCensus.refresh(spark, store) // back to a clean pin
    plantPartFile((924 to 925).map(i => (i, s"rr_$i")).toDF("doc_id", "text"),
      root, "part-00001-retyped-root.parquet")
    val e2 = intercept[IllegalStateException] { StoreCensus.refresh(spark, store) }
    assert(e2.getMessage.contains("doc_id"), e2.getMessage)
  }

  /** A parquet file written through parquet-hadoop's Group API — a
    * FOREIGN writer: no embedded Spark schema in the footer, exactly
    * what a non-Spark tool's out-of-band append looks like. `payload`
    * is unannotated BINARY, the type whose Spark reading
    * spark.sql.parquet.binaryAsString flips. */
  private def writeForeignFile(dir: java.nio.file.Path, name: String,
      ids: Range, retypedDocId: Boolean = false): Unit = {
    val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      if (retypedDocId)
        "message g { required int32 doc_id; optional binary payload; }"
      else
        "message g { required int64 doc_id; optional binary payload; }")
    java.nio.file.Files.createDirectories(dir)
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(new Path(dir.resolve(name).toString))
      .withConf(new Configuration()).withType(schema).build()
    try ids.foreach { i =>
      val g = new org.apache.parquet.example.data.simple.SimpleGroup(schema)
      if (retypedDocId) g.add("doc_id", i) else g.add("doc_id", i.toLong)
      g.add("payload", org.apache.parquet.io.api.Binary.fromString(s"p_$i"))
      w.write(g)
    } finally w.close()
  }

  test("fence follows the session's parquet conversion confs on FOREIGN files — a conforming append under binaryAsString passes, real drift still fires") {
    // ADVICE r14 (medium): the pin is taken via sp.read.parquet under
    // the SESSION conf, but the r14 fence converted footers with
    // static defaults — on foreign files (no embedded Spark schema) a
    // session overriding binaryAsString made pin ("string") and fence
    // ("binary") disagree on IDENTICAL files, so every post-pin
    // refresh fence-failed conforming appends: a persistent false
    // positive that fails the triggering write. Mutation: rebuild the
    // converter with the no-arg ctor in fenceSchemas — the first
    // refresh below throws.
    val store = tmpDir("graft_fence_foreign_")
    val root = java.nio.file.Paths.get(store)
    writeForeignFile(root, "part-00000-foreign.parquet", 0 until 8)
    spark.conf.set("spark.sql.parquet.binaryAsString", "true")
    try {
      StoreCensus.refresh(spark, store)
      assert(StoreCensus.lookup(store).get.schema.get("payload")
        .dataType.typeName == "string",
        "precondition: binaryAsString must shift a foreign pin to string")
      val before = StoreCensus.lookup(store).get.files.length
      writeForeignFile(root, "part-00001-foreign.parquet", 8 until 16)
      StoreCensus.refresh(spark, store) // must NOT throw
      assert(StoreCensus.lookup(store).get.files.length == before + 1,
        "a conforming foreign append must be censused, not fenced out")
      // ...and the fence still fires on REAL foreign drift under the
      // same overridden conf (the session converter is not a bypass)
      writeForeignFile(root, "part-00002-retyped.parquet", 16 until 20,
        retypedDocId = true)
      val e = intercept[IllegalStateException] {
        StoreCensus.refresh(spark, store)
      }
      // direction pinned: the FILE carries int, the PIN has bigint —
      // a bare contains("int") is implied by contains("bigint") and
      // cannot catch a fence reporting the pinned type on both sides
      assert(e.getMessage.contains("schema drift") &&
        e.getMessage.contains("`doc_id` as int ") &&
        e.getMessage.contains("has bigint"), e.getMessage)
    } finally spark.conf.unset("spark.sql.parquet.binaryAsString")
  }

  test("fence honors a file's embedded Spark schema — conversion-conf overrides never fence Spark-written appends") {
    import spark.implicits._
    // the other half of the ADVICE r14 fix, guarding against the
    // naive converter-only repair: Spark-written files EMBED their
    // exact Spark schema in the footer and both the pin's inference
    // and the scan prefer it over MessageType conversion, so under
    // binaryAsString=true a Spark-written store pins payload as
    // BINARY. A fence that converted the raw MessageType with the
    // session conf would read "string" and fence-fail every
    // conforming Spark-written append — the same false-positive class
    // the fix removes, introduced from the other side. Mutation: drop
    // the embedded-schema preference in fenceFooterFields — the
    // conforming refresh below throws.
    val store = "graftfs:" + tmpDir("graft_fence_embed_")
    val df = (0L until 32L).map(i => (i, s"payload_$i"))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary")) // footer: unannotated BINARY
      .withColumn("bucket", pmod(hash(col("doc_id")), lit(4)))
    df.repartition(4, col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(store)
    spark.conf.set("spark.sql.parquet.binaryAsString", "true")
    try {
      StoreCensus.refresh(spark, store)
      assert(StoreCensus.lookup(store).get.schema.get("payload")
        .dataType.typeName == "binary",
        "precondition: the embedded Spark schema must win the pin over binaryAsString")
      val before = StoreCensus.lookup(store).get.files.length
      plantPartFile((100L to 103L).map(i => (i, s"ok_$i"))
          .toDF("doc_id", "text")
          .withColumn("payload", col("text").cast("binary")),
        java.nio.file.Paths.get(store.stripPrefix("graftfs:"), "bucket=0"),
        "part-00000-conforming-binary.parquet")
      StoreCensus.refresh(spark, store) // must NOT throw
      assert(StoreCensus.lookup(store).get.files.length == before + 1,
        "a conforming Spark-written append must be censused, not fenced out")
      // real drift in a Spark-written append still fires: the
      // embedded schema is compared, not trusted blindly
      plantPartFile((104 to 105).map(i => (i, s"rt_$i"))
          .toDF("doc_id", "text") // doc_id INT32 — a true retype
          .withColumn("payload", lit("x").cast("binary")),
        java.nio.file.Paths.get(store.stripPrefix("graftfs:"), "bucket=0"),
        "part-00001-retyped.parquet")
      val e = intercept[IllegalStateException] {
        StoreCensus.refresh(spark, store)
      }
      assert(e.getMessage.contains("schema drift") &&
        e.getMessage.contains("doc_id"), e.getMessage)
    } finally spark.conf.unset("spark.sql.parquet.binaryAsString")
  }

  test("fence cross-checks the embedded schema against the physical columns — an inconsistent writer cannot slip physical drift past matching metadata (ADVICE r15)") {
    val (store, _) = freshStore("fence_inconsistent")
    StoreCensus.refresh(spark, store) // pins (doc_id, text) + bucket
    // a file whose footer KEY-VALUE METADATA claims exactly the
    // pinned columns while its PHYSICAL MessageType drifted (text
    // dropped, extra added) — a stale/forged-metadata writer. The
    // embedded preference alone (mutation: drop the name cross-check
    // in chooseFooterStruct) trusts the metadata, censuses the file,
    // and the drift surfaces only as a later scan error — the exact
    // seam the fence exists to close. Zero row groups keeps the
    // fixture minimal: the fence is footer-only (SKIP_ROW_GROUPS).
    val b0 = java.nio.file.Paths.get(store.stripPrefix("graftfs:"), "bucket=0")
    java.nio.file.Files.createDirectories(b0)
    val phys = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      "message g { required int64 doc_id; optional binary extra; }")
    val claimed = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")
    val w = new org.apache.parquet.hadoop.ParquetFileWriter(
      org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new Path(b0.resolve("part-00000-inconsistent.parquet").toString),
        new Configuration()),
      phys, org.apache.parquet.hadoop.ParquetFileWriter.Mode.CREATE,
      128L << 20, 8 << 20)
    w.start()
    w.end(java.util.Collections.singletonMap(
      org.apache.spark.sql.execution.datasources.parquet
        .ParquetReadSupport.SPARK_METADATA_KEY, claimed.json))
    val e = intercept[IllegalStateException] {
      StoreCensus.refresh(spark, store)
    }
    assert(e.getMessage.contains("schema drift") &&
      e.getMessage.contains("extra"), e.getMessage)
    assert(StoreCensus.nonEmpty(store).isEmpty,
      "the violation must invalidate the entry")
  }

  test("chooseFooterStruct: embedded trusted only while its names match the physical columns") {
    import org.apache.spark.sql.types._
    val emb = new StructType().add("a", "long").add("b", "string")
    val conv = new StructType().add("a", "long").add("c", "binary")
    // consistent writer: embedded wins (its types are the scan's truth,
    // immune to conversion-conf overrides — the r15 fix's direction)
    assert(StoreCensus.chooseFooterStruct(Some(emb), Set("a", "b"), conv) eq emb)
    // inconsistent writer: PHYSICAL truth wins — unconditional
    // embedded preference is the red mutation here
    assert(StoreCensus.chooseFooterStruct(Some(emb), Set("a", "c"), conv) eq conv)
    // foreign file (no embedded schema): converted
    assert(StoreCensus.chooseFooterStruct(None, Set("a", "c"), conv) eq conv)
    // conversion is by-name — a trusted embedded schema must not pay it
    var forced = false
    StoreCensus.chooseFooterStruct(Some(emb), Set("a", "b"),
      { forced = true; conv })
    assert(!forced, "trusted-embedded path must not force the converter")
  }

  test("refresh gauge is per-store: set by a successful refresh, isolated between stores, -1 before first refresh") {
    val (a, _) = freshStore("gauge_a")
    val (b, _) = freshStore("gauge_b")
    assert(StoreCensus.lastRefreshNanos(a) == -1L,
      "a never-refreshed store must read -1")
    StoreCensus.refresh(spark, a)
    val ga = StoreCensus.lastRefreshNanos(a)
    assert(ga > 0L, "a successful refresh must set the gauge")
    assert(StoreCensus.lastRefreshNanos(b) == -1L,
      "refreshing store A must not touch store B's gauge")
    StoreCensus.refresh(spark, b)
    assert(StoreCensus.lastRefreshNanos(b) > 0L)
    assert(StoreCensus.lastRefreshNanos(a) == ga,
      "store B's refresh must not overwrite store A's reading — " +
        "the JVM-wide gauge this replaces interleaved exactly here")
  }

  test("a transient FS error during restart recovery degrades to live listing and retries — never throws from a probe, never settles permanently") {
    val (store, before) = freshStore("hiccup")
    StoreCensus.refresh(spark, store) // drops the marker
    StoreCensus.clearForTest()        // simulated restart
    val localRoot = store.stripPrefix("graftfs:")
    // the recovery refresh's FIRST listing dies (transient); the probe
    // read must fall back to live listing and answer — r12 threw the
    // error out of lookup() (a pure probe path that never threw) AND
    // permanently settled the dir via refresh's invalidate-on-failure,
    // silently reinstating the per-probe listing tax for the JVM's
    // lifetime (ADVICE r12, medium; mutation: remove maybeRecover's
    // catch)
    GraftTestFs.failListOnce = localRoot
    val rows = StoreCensus.read(spark, store).collect().toSet
    assert(rows == before, "hiccup read must fall back and stay correct")
    // a later lookup — once the failure's backoff window passes
    // (test hook; 10 s wall otherwise) — RETRIES recovery and wins...
    StoreCensus.expireRecoveryBackoffForTest(store)
    assert(ES.storeNonEmpty(store))
    // ...after which reads are census-served again: FRAME CREATION
    // makes zero metadata calls (the scan itself may open files)
    GraftTestFs.reset()
    val frame = StoreCensus.read(spark, store)
    assert(GraftTestFs.metadataCalls(localRoot) == 0,
      s"recovery must have retried after the hiccup: " +
        s"${GraftTestFs.metadataCalls(localRoot)} metadata calls")
    assert(frame.collect().toSet == before)
  }

  test("recovery failures back off exponentially — no per-probe storm, never permanently dead") {
    val (store, before) = freshStore("storm")
    StoreCensus.refresh(spark, store) // drops the marker
    StoreCensus.clearForTest()        // simulated restart
    val localRoot = store.stripPrefix("graftfs:")
    // a broken-but-marked store (dead ACL, corrupt dir): the first
    // probe pays one failed attempt and opens a backoff window...
    GraftTestFs.failListUnder = localRoot
    try {
      assert(StoreCensus.nonEmpty(store).isEmpty,
        "attempt 1 must degrade, not serve")
      // ...inside the window every probe is FREE (one map read):
      // without the backoff gate every probe of a broken store
      // re-pays a failed walk + log line forever, a worse tax than
      // the one recovery removes (mutation: drop the window check in
      // maybeRecover)
      val baseline = GraftTestFs.metadataCalls(localRoot)
      (1 to 5).foreach(_ => assert(StoreCensus.nonEmpty(store).isEmpty))
      assert(GraftTestFs.metadataCalls(localRoot) == baseline,
        "in-window probes must make zero filesystem calls")
      // when the window expires the next probe RETRIES (one more
      // attempt, longer window): persistent failure costs one attempt
      // per window, not one per probe
      StoreCensus.expireRecoveryBackoffForTest(store)
      assert(StoreCensus.nonEmpty(store).isEmpty)
      assert(GraftTestFs.metadataCalls(localRoot) > baseline,
        "an out-of-window probe must retry recovery")
      val after2 = GraftTestFs.metadataCalls(localRoot)
      (1 to 5).foreach(_ => assert(StoreCensus.nonEmpty(store).isEmpty))
      assert(GraftTestFs.metadataCalls(localRoot) == after2,
        "the second window must gate probes like the first")
      // HIGH-attempt regime (VERDICT r13's one bug): the r13 power
      // formula overflowed Long at attempt >= 20 (~2.8 h of persistent
      // failure) and wrapped the window into the PAST, so every probe
      // of a still-broken store re-paid a failed walk — the exact
      // storm this test exists to forbid. Force attempt 25 (seam keeps
      // the window derivation honest: it calls backoffMs) and assert
      // the window still gates (mutation: restore the
      // `10000L * pow(10, attempt-1).toLong` formula — red here)
      StoreCensus.forceRecoveryAttemptForTest(store, 25)
      val after25 = GraftTestFs.metadataCalls(localRoot)
      (1 to 5).foreach(_ => assert(StoreCensus.nonEmpty(store).isEmpty))
      assert(GraftTestFs.metadataCalls(localRoot) == after25,
        "attempt-25 in-window probes must make zero filesystem calls " +
          "(a negative/overflowed window lands in the past and storms)")
      // and the schedule itself is law-pinned: positive, bounded by
      // the 10-min ceiling, and monotone across the whole attempt
      // range a multi-day outage can reach
      (1 to 1000).foreach { a =>
        val w = StoreCensus.backoffMs(a)
        assert(w > 0 && w <= 600000L, s"backoffMs($a) = $w out of band")
        assert(w >= StoreCensus.backoffMs(math.max(1, a - 1)),
          s"backoffMs must be monotone at $a")
      }
      assert(StoreCensus.backoffMs(1) == 10000L &&
        StoreCensus.backoffMs(2) == 100000L &&
        StoreCensus.backoffMs(3) == 600000L,
        "the documented 10 s / 100 s / 600 s schedule must hold exactly")
      // and when the OUTAGE clears (not the JVM), the next
      // out-of-window probe recovers — a hard attempt cap would have
      // settled the store dead for the JVM's lifetime off one brief
      // outage, silently reinstating the per-probe listing tax for
      // probe-only workloads, the exact case recovery exists for
      // (mutation: settle permanently after N failures)
      GraftTestFs.reset()
      StoreCensus.expireRecoveryBackoffForTest(store)
      assert(StoreCensus.nonEmpty(store).contains(true),
        "recovery must succeed once the outage clears")
      assert(StoreCensus.read(spark, store).collect().toSet == before)
    } finally GraftTestFs.reset()
  }

  test("marker crash window pinned: a refresh that cannot drop the marker still commits; recovery re-arms at the next mutation") {
    val (store, before) = freshStore("marker_crash")
    val localRoot = store.stripPrefix("graftfs:")
    def markerOnDisk: Boolean = java.nio.file.Files.exists(
      java.nio.file.Paths.get(localRoot, StoreCensus.MarkerName))
    // the first refresh lists and installs the entry but dies at the
    // marker create — the marker only gates post-restart lazy rebuild,
    // so the refresh (and the mutation that triggered it) must still
    // succeed (mutation: unwrap the marker create's catch)
    GraftTestFs.failCreateUnder = StoreCensus.MarkerName
    StoreCensus.refresh(spark, store)
    GraftTestFs.reset()
    assert(!markerOnDisk, "the injection must have suppressed the marker")
    assert(StoreCensus.nonEmpty(store).contains(true),
      "a marker-create failure must not fail the refresh")
    // restart INSIDE the window: the store is unmarked, so reads take
    // the correct-but-slower live-listing path — the designed shape
    StoreCensus.clearForTest()
    assert(StoreCensus.read(spark, store).collect().toSet == before)
    assert(StoreCensus.nonEmpty(store).isEmpty,
      "an unmarked store must not be adopted mid-window")
    // the window CLOSES at the next mutation: its refresh re-drops the
    // marker, and recovery works after the next restart — by design,
    // not by accident
    StoreCensus.refresh(spark, store)
    assert(markerOnDisk, "the next refresh must re-drop the marker")
    StoreCensus.clearForTest()
    assert(StoreCensus.read(spark, store).collect().toSet == before)
    assert(StoreCensus.nonEmpty(store).contains(true),
      "recovery must be re-armed once the window closes")
  }

  test("gate-level census kill-switch equivalence: st24 end-to-end, census-on == census-off") {
    // CENSUS_AB_r12 proved this once, manually, for all st2x gates;
    // this is the standing in-suite analogue (VERDICT r12 item 3) so
    // the property cannot rot between artifact rounds. One
    // representative store gate, full pipeline — staged chunks,
    // micro-batch ingest, compaction, store-served probes — run both
    // ways; sorted-row equality. Mutation: a census serving a wrong
    // file set (e.g. skip refresh after append) turns it red.
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory)
    def run(): Seq[String] =
      ES.st24StreamAnnIndex(spark, sf).collect().map(_.toString).sorted.toSeq
    val on = run()
    spark.conf.set("spark.graft.storeCensus.enabled", "false")
    val off =
      try run()
      finally spark.conf.unset("spark.graft.storeCensus.enabled")
    assert(on.nonEmpty, "the gate must produce rows")
    assert(on == off,
      "census-on and census-off must be row-identical end-to-end")
  }

  test("gate-level census kill-switch equivalence: st26 end-to-end, census-on == census-off") {
    // second standing gate (VERDICT r13 item 3): st24 covers the
    // ANN-index probe shape; st26 is the TOMBSTONE FOLD — the probe
    // shape most entangled with invalidate/refresh ordering
    // (deleteFromStore rides rewriteStore's swap: invalidate on
    // failure, refresh on success, then the post-delete probe must
    // see the folded store, not a stale pre-delete census). Mutation:
    // a census serving a wrong file set after the fold (e.g. skip
    // rewriteStore's refresh) turns it red. sf0.01, not st24's
    // sf0.001: the tiny corpus yields ZERO near-dup matches after the
    // fold there, and empty==empty would pass with a broken census —
    // the nonEmpty guard below is what makes the equivalence mean
    // anything.
    val sf = "/root/testdata/sf0.01"
    assume(new java.io.File(sf).isDirectory)
    def run(): Seq[String] =
      ES.st26TombstoneDedup(spark, sf).collect().map(_.toString).sorted.toSeq
    val on = run()
    spark.conf.set("spark.graft.storeCensus.enabled", "false")
    val off =
      try run()
      finally spark.conf.unset("spark.graft.storeCensus.enabled")
    assert(on.nonEmpty, "the gate must produce rows")
    assert(on == off,
      "census-on and census-off must be row-identical end-to-end")
  }

  test("a garbage kill-switch conf value never throws from a census probe (default-on)") {
    // lookup() is a probe path that contractually never throws; the
    // r13 resolution did .toBoolean on the conf, so a value that
    // bypassed the operator-facing env validation (set directly on
    // the session) detonated IllegalArgumentException out of every
    // probe. Only a case-insensitive "false" disables; anything else
    // stays default-ON — and loudness for typos lives at the set
    // sites (Verify/StoreProbe fail fast on non-boolean env values).
    val (store, before) = freshStore("killswitch_garbage")
    StoreCensus.refresh(spark, store)
    spark.conf.set("spark.graft.storeCensus.enabled", "bogus")
    try {
      assert(StoreCensus.nonEmpty(store).contains(true),
        "a garbage value must leave census serving ON, not throw")
      assert(StoreCensus.read(spark, store).collect().toSet == before)
      spark.conf.set("spark.graft.storeCensus.enabled", "FALSE")
      assert(StoreCensus.nonEmpty(store).isEmpty,
        "case-insensitive false must still disable")
    } finally spark.conf.unset("spark.graft.storeCensus.enabled")
  }

  test("non-atomic-rename schemes are refused loudly unless opted in") {
    import spark.implicits._
    val local = tmpDir("graft_s3a_store_")
    val store = "s3a:" + local
    val df = (0L until 16L).map(i => (i, s"p$i")).toDF("doc_id", "text")
      .withColumn("bucket", pmod(hash(col("doc_id")), lit(4)))
    df.repartition(4, col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(store)
    val e = intercept[IllegalStateException] {
      ES.rewriteStore(spark, store, spark.read.parquet(store))
    }
    assert(e.getMessage.contains("atomically") &&
      e.getMessage.contains("allowNonAtomicRename"), e.getMessage)
    // deployment opt-in: warn-and-proceed (our s3a is local-backed, so
    // the swap itself succeeds once allowed)
    spark.conf.set("spark.graft.store.allowNonAtomicRename", "true")
    try {
      val before = spark.read.parquet(store).collect().toSet
      ES.rewriteStore(spark, store,
        spark.read.parquet(store).filter(col("doc_id") =!= 0L))
      assert(spark.read.parquet(store).collect().toSet ==
        before.filterNot(_.getLong(0) == 0L))
    } finally spark.conf.unset("spark.graft.store.allowNonAtomicRename")
  }
}
