package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (ScaleProbe's streaming sibling): measured evidence that
  * the streaming dedup stores survive a LONG-RUNNING ingest, not just
  * the 4–5-batch gates and the 14-batch spec. Replays N micro-batches
  * (default 48) of a corpus through `st21Batch` (the CDC
  * chunk-signature store) or `st20Batch` (the band+shingle stores,
  * every batch carrying ~1/16 arrivals so the probe path runs too),
  * timing EACH batch and recording the worst files-per-bucket after
  * it; `st24` replays the ANN index ingest over the vector corpus
  * the same way. One JSON line, checked in as `STORE_r{N}.json`:
  *
  *   sbt "runMain graft.StoreProbe st21 48"
  *
  * What healthy output looks like: files-per-bucket stays under the
  * compaction threshold forever (the bounded-listing law), and
  * per-batch time holds FLAT across the run — the second half's
  * median is within noise of the first half's (`drift` ≈ 1) — because
  * probe reads are bucket-pruned to the batch's own keys, not the
  * store's size. The known cost the series will show: a compaction
  * batch folds the whole store, so its spikes grow with accumulated
  * corpus (single-level fold economics, amortized O(corpus/K) per
  * batch — see maybeCompactStore's scaladoc for why that trade is
  * taken over tiered levels at this store's scale).
  *
  * Corpus: the ScaleProbe 10× twin when already staged (50k docs —
  * big enough that store growth, not fixed overhead, is what the
  * series measures), else the sf0.1 fixture.
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse("st21")
    require(gate == "st21" || gate == "st20" || gate == "st24",
      s"unknown gate: $gate")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(48)
    require(nBatches >= 2, "need at least 2 batches for the drift halves")
    // optional 3rd arg: corpus factor (10 default; 100 replays the
    // ScaleProbe 100× twin so the flat-per-batch claim is pinned at a
    // store two orders past the gate fixtures)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    require(factor == 10 || factor == 100, s"factor must be 10 or 100")
    // optional 4th arg: store bucket count (spark.graft.storeBuckets)
    // — the production scale knob; the 100× probe measures it
    val buckets = args.lift(3).map(_.toInt)
    // optional 5th arg "tomb": after the ingest, time a corpus-refresh
    // tombstone fold (delete a deterministic 1/7 id slice from every
    // standing store) at the FULL store size, then replay one more
    // probe batch — the fold is O(store) by design (a compaction with
    // a filter); the claim under measure is that probes afterwards
    // cost the same as before.
    // "tombmid" instead folds HALF the corpus out MID-SERIES (at
    // batch 2N/3) and keeps replaying: the claim under measure is the
    // design's central retention assertion — per-batch probe cost at
    // the saturating workload tracks STANDING-STORE size, so a
    // refresh-window fold RESETS the growth rather than probes
    // degrading with all of history
    val tomb = args.lift(4).contains("tomb")
    val tombMid = args.lift(4).contains("tombmid")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    buckets.foreach(b => spark.conf.set("spark.graft.storeBuckets", b.toString))
    // SPARK_GRAFT_CENSUS=false A/Bs the catalog-backed file index
    // itself (reads take the raw listing path; semantics unchanged)
    sys.env.get("SPARK_GRAFT_CENSUS").foreach { v =>
      require(v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false"),
        s"SPARK_GRAFT_CENSUS must be true or false, got '$v'")
      spark.conf.set("spark.graft.storeCensus.enabled", v.toLowerCase)
    }
    graft.functions.VectorExpressions.register(spark)

    // resolve the CURRENT scheme's 10× twin via ScaleProbe's staging
    // key — a /tmp glob could land on a retired scheme's stale dir
    // and silently measure the wrong corpus
    // st24 ingests the VECTOR corpus; the dedup stores ingest docs
    val table = if (gate == "st24") "embeddings" else "documents"
    val twin = Some(s"/tmp/graft_scale${factor}x_" +
        ScaleProbe.stagingKey("/root/testdata/sf0.1") + s"/$table.parquet")
      .filter(p => new java.io.File(s"$p/_SUCCESS").exists())
    require(factor == 10 || twin.nonEmpty,
      "100x twin not staged — run `runMain graft.ScaleProbe 100` first")
    val src = twin.getOrElse(s"/root/testdata/sf0.1/$table.parquet")
    System.err.println(s"[store] corpus: $src")

    // stage one single-file chunk per batch ONCE (untimed), so each
    // replayed batch is an O(batch) read — the shape a file-source
    // micro-batch delivers. doc_id % N spreads replicas evenly. The
    // split count stays EXACTLY nBatches (not nBatches+1): the
    // synthesized twins replicate docs at a fixed id stride, so the
    // split modulus decides how replicas cluster into batches — a
    // different modulus is a DIFFERENT workload, and series would stop
    // being comparable across rounds (measured: a 49-way restage
    // moved per-batch medians ~2x). The tomb leg gets its genuinely
    // new ids by OFFSET instead (below).
    val stagedRoot = {
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$src:$nBatches".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val dir = s"/tmp/graft_storeprobe_$key"
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        val (idCol, cols) =
          if (gate == "st24") ("vec_id", Seq(col("vec_id"), col("embedding")))
          else ("doc_id", Seq(col("doc_id"), col("text")))
        spark.read.parquet(src).select(cols: _*)
          .withColumn("b", pmod(col(idCol), lit(nBatches.toLong)))
          .repartition(nBatches, col("b"))
          .write.mode("overwrite").partitionBy("b").parquet(dir)
      }
      dir
    }

    val work = graft.core.Staging.tempAtExit(s"graft_storeprobe_${gate}_")

    // ONE dispatch for the main series and the tomb leg's post-fold
    // replay — a divergence between the two would make
    // post_fold_batch_sec measure a different workload than the
    // series it is compared against. `idOffset` (tomb leg only) maps
    // the replayed chunk onto ids the store has never seen, so the
    // post-fold batch appends genuinely NEW rows with the series'
    // own workload shape — a plain re-append of known ids (the r10
    // shape) ran against inflated per-chunk frequencies and duplicate
    // band keys (an r10 advisory finding).
    def runBatch(i: Int, idOffset: Long = 0L): Unit = {
      val idCol = if (gate == "st24") "vec_id" else "doc_id"
      val batch = spark.read.parquet(s"$stagedRoot/b=$i")
        .withColumn(idCol, col(idCol) + lit(idOffset))
      gate match {
        case "st21" =>
          graft.streaming.EventStreams.st21Batch(
            batch, s"$work/sigs", s"$work/pairs")
        case "st20" =>
          // ~1/16 of EVERY batch arrives as probes (mixed-batch
          // contract: the probe side unions the batch's own corpus).
          // The flag keys on doc_id div nBatches, which enumerates
          // 0,1,2,… WITHIN a batch (batches partition on doc_id %
          // nBatches) — a doc_id % 16 flag aliases with the batch
          // split whenever gcd(nBatches,16) > 1 (at the default 48,
          // 3 batches were all-arrivals and 45 never probed)
          graft.streaming.EventStreams.st20Batch(
            batch.withColumn("is_new",
              expr(s"pmod(doc_id div $nBatches, 16) = 0")),
            s"$work/bands", s"$work/sh", s"$work/out")
        case "st24" =>
          graft.streaming.EventStreams.st24Batch(batch, s"$work/idx")
      }
    }

    // Bench's calib discipline, ported: this box shows hour-scale
    // weather (same-code STORE100 series measured 1.3-1.4x apart),
    // so a drift number without bracketing box-health readings can't
    // be told from a real economics change. Every 8 batches the series
    // carries BOTH a fixed CPU probe and a fixed DISK probe (64 MiB
    // write+fsync on the store's own filesystem): the r9/r10 lesson is
    // that the inflation lives in store/checkpoint IO the CPU calib
    // cannot see — STORE100_r10's five same-code series scattered
    // 1.02–1.47 with no per-series IO trace to read the outlier
    // against. Now each drift number ships with its IO curve.
    def calib(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1, 32)
        .selectExpr("sum(cast(id AS double) * id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def ioProbe(): Double = {
      var f: java.io.File = null
      try {
        f = java.io.File.createTempFile("graft_store_io_", ".bin",
          new java.io.File(work))
        val t0 = System.nanoTime()
        val out = new java.io.FileOutputStream(f)
        val block = new Array[Byte](1 << 20)
        try {
          var i = 0
          while (i < 64) { out.write(block); i += 1 }
          out.getFD.sync()
        } finally out.close()
        64.0 / ((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[store] io probe failed: ${e.getMessage}"); -1.0
      } finally if (f != null) f.delete()
    }
    val calibs = scala.collection.mutable.ListBuffer[(Int, Double, Double)]()
    def probeCalib(at: Int): Unit = {
      val c = calib(); val io = ioProbe(); calibs += ((at, c, io))
      System.err.println(f"[store] calib @batch $at%3d  $c%6.2f s  io $io%7.1f MB/s")
    }
    val mainStore = gate match {
      case "st21" => s"$work/sigs"
      case "st20" => s"$work/bands"
      case "st24" => s"$work/idx"
    }
    // one fold implementation for both tomb legs — deletion is a
    // compaction with a filter over every standing store of the gate
    def foldStores(ids: DataFrame): Double = {
      val t0 = System.nanoTime()
      gate match {
        case "st21" => graft.streaming.EventStreams.deleteFromStore(
          spark, s"$work/sigs", "doc_id", ids.toDF("doc_id"))
        case "st20" =>
          graft.streaming.EventStreams.deleteFromStore(
            spark, s"$work/bands", "corpus_id", ids.toDF("corpus_id"))
          graft.streaming.EventStreams.deleteFromStore(
            spark, s"$work/sh", "doc_id", ids.toDF("doc_id"))
        case "st24" => graft.streaming.EventStreams.deleteFromStore(
          spark, s"$work/idx", "vec_id", ids.toDF("vec_id"))
      }
      (System.nanoTime() - t0) / 1e9
    }
    val srcIdCol = if (gate == "st24") "vec_id" else "doc_id"
    val midAt = 2 * nBatches / 3
    var midFoldSec = -1.0
    val times = Array.ofDim[Double](nBatches)
    val files = Array.ofDim[Int](nBatches)
    val listMs = Array.ofDim[Double](nBatches)
    // the REAL mutation refresh's wall time (listing + fence fan-out),
    // read from StoreCensus's gauge after each batch — an explicit
    // re-refresh here would see zero fresh files and skip the fence,
    // measuring only the walk. This is the series the STORE100
    // artifacts' refresh_ms band pins (the fence must stay invisible
    // next to batch times three orders larger). Staleness guard
    // (ADVICE r15), mirroring the fold leg's: a batch whose ingest
    // never refreshed the store (e.g. a dedup gate writing zero new
    // rows) records -1 instead of silently repeating the previous
    // batch's reading — detected via the store's monotone refresh
    // SEQUENCE snapshotted BEFORE each batch (ADVICE r16: the old
    // duration-compare would miss two refreshes that happened to take
    // identical nanos).
    val refreshMs = Array.ofDim[Double](nBatches)
    for (i <- 0 until nBatches) {
      if (i % 8 == 0) probeCalib(i)
      if (tombMid && i == midAt) {
        // the refresh-window fold: half the corpus ages out of the
        // standing index mid-ingest (untimed in the series; recorded
        // separately) — subsequent batches must drop back toward
        // early-series levels, or "retention bounds the growth" is
        // just a docstring
        midFoldSec = foldStores(spark.read.parquet(src)
          .select(col(srcIdCol).as("id"))
          .filter(pmod(col("id"), lit(2L)) === 0L))
        System.err.println(
          f"[store] $gate MID-SERIES fold at batch $i%3d  $midFoldSec%6.2f s")
      }
      // snapshot AFTER the mid-series fold (whose swap moves the same
      // gauge), or the fold's reading would mask a batch that skipped
      // its refresh on exactly the midAt iteration
      val preSeq = graft.streaming.StoreCensus.lastRefreshSeq(mainStore)
      val t0 = System.nanoTime()
      runBatch(i)
      times(i) = (System.nanoTime() - t0) / 1e9
      files(i) = (gate match {
        case "st21" => Seq(s"$work/sigs")
        case "st20" => Seq(s"$work/bands", s"$work/sh")
        case "st24" => Seq(s"$work/idx")
      }).map(graft.streaming.EventStreams.maxFilesPerBucket).max
      // the listing share a probe pays for creating the store frame —
      // census-served after every batch's refresh, so this must sit at
      // ~0 ms however long the ingest has run (the r10 re-listing tax
      // was 210–280 ms/batch at the 100× layout)
      val tl = System.nanoTime()
      graft.streaming.StoreCensus.read(spark, mainStore)
      listMs(i) = (System.nanoTime() - tl) / 1e6
      refreshMs(i) = {
        if (graft.streaming.StoreCensus.lastRefreshSeq(mainStore) != preSeq)
          graft.streaming.StoreCensus.lastRefreshNanos(mainStore) / 1e6
        else -1.0
      }
      System.err.println(
        f"[store] $gate batch $i%3d  ${times(i)}%6.2f s  maxFiles ${files(i)}%3d  " +
          f"list ${listMs(i)}%6.1f ms  refresh ${refreshMs(i)}%6.1f ms")
    }
    // steady-state drift: median of the second half vs the first half
    // past JVM warmup (batches 0-7 pay per-plan codegen; for short
    // runs the warmup trim shrinks so both halves stay non-empty and
    // the series is never discarded after it was paid for)
    def median(xs: Seq[Double]) = {
      val s = xs.sorted; s(s.size / 2)
    }
    val warm = math.min(8, math.max(0, nBatches / 2 - 1))
    val h1 = median(times.slice(warm, nBatches / 2).toSeq)
    val h2 = median(times.slice(nBatches / 2, nBatches).toSeq)
    val js = times.indices.map(i =>
      s"""{"t":${times(i)},"files":${files(i)},"list_ms":${listMs(i)}}""")
      .mkString(",")
    probeCalib(nBatches)
    val calibJson = calibs.map { case (at, c, io) =>
      s"""{"batch":$at,"sec":$c,"io_mbps":$io}""" }
      .mkString("[", ",", "]")
    val nBuckets = graft.streaming.EventStreams.StoreBuckets
    // tombstone leg: fold the slice out of every standing store, then
    // one more replayed batch at the post-fold store
    val tombJson = if (tomb) {
      // the fold's own refresh is the fence's WORST CASE: the swap
      // renews every bucket's file, so this one refresh fences the
      // whole store's width in a single fan-out. Guard against gauge
      // staleness (an independent-review finding): if the fold's
      // swap somehow skipped the refresh, the gauge still holds the
      // last ingest batch's reading — publishing THAT as the worst
      // case would be a lie, so an unmoved refresh SEQUENCE records
      // -1 (the sequence, not the duration, is the staleness key —
      // ADVICE r16).
      val preFoldSeq = graft.streaming.StoreCensus.lastRefreshSeq(mainStore)
      val foldSec = foldStores(spark.read.parquet(src)
        .select(col(srcIdCol).as("id"))
        .filter(pmod(col("id"), lit(7L)) === 3L))
      val foldRefreshMs =
        if (graft.streaming.StoreCensus.lastRefreshSeq(mainStore) != preFoldSeq)
          graft.streaming.StoreCensus.lastRefreshNanos(mainStore) / 1e6
        else -1.0
      // frame-creation cost against the standing store, both ways:
      // census-served (the path every probe takes — ~0 regardless of
      // store size or age) vs cold (what the same frame costs without
      // the census: InMemoryFileIndex listing + footer schema read,
      // the r10 per-batch tax, still bounded by compaction)
      val tl = System.nanoTime()
      graft.streaming.StoreCensus.read(spark, mainStore)
      val listSec = (System.nanoTime() - tl) / 1e9
      val tc = System.nanoTime()
      spark.read.parquet(mainStore)
      val listColdSec = (System.nanoTime() - tc) / 1e9
      // batch 1's data replayed on OFFSET ids (far past the corpus id
      // range), through the SAME dispatch — genuinely new ids, so the
      // post-fold number measures the series' own workload against
      // the post-fold store, not a duplicate re-append. The is_new
      // flag re-derives from the offset ids: offset ≡ 0 mod (16 ×
      // nBatches) keeps the flagged fraction and batch alignment
      // identical to the replayed chunk's original run.
      val t1 = System.nanoTime()
      runBatch(1, idOffset = 16L * nBatches * 100000000L)
      val postSec = (System.nanoTime() - t1) / 1e9
      System.err.println(
        f"[store] $gate tombstone fold $foldSec%6.2f s  post-fold batch " +
          f"$postSec%6.2f s  census listing $listSec%6.3f s  cold $listColdSec%6.3f s")
      s""","tomb_fold_sec":$foldSec,"fold_refresh_ms":$foldRefreshMs,""" +
        s""""post_fold_batch_sec":$postSec,""" +
        s""""store_list_sec":$listSec,"store_list_cold_sec":$listColdSec"""
    } else ""
    val midJson = if (tombMid)
      s""""mid_fold_at":$midAt,"mid_fold_sec":$midFoldSec,""" else ""
    // same median convention as the drift halves above (one rule per
    // artifact, so the two medians stay comparable); -1 staleness
    // sentinels stay visible in the series but never skew the summary
    // stats (all-stale → -1, stated rather than fabricated)
    val refreshSeen = refreshMs.filter(_ >= 0)
    val refreshJson =
      s""""refresh_ms":{"n":$nBatches,"n_stale":${nBatches - refreshSeen.length},""" +
        s""""median":${if (refreshSeen.nonEmpty) median(refreshSeen.toSeq) else -1.0},""" +
        s""""max":${if (refreshSeen.nonEmpty) refreshSeen.max else -1.0},""" +
        s""""series":[${refreshMs.mkString(",")}]}"""
    println(s"""{"metric":"store_econ","gate":"$gate","factor":$factor,"buckets":$nBuckets,"batches":$nBatches,$midJson""" +
      s""""median_first_half":$h1,"median_second_half":$h2,""" +
      s""""drift":${h2 / h1},"max_files":${files.max}$tombJson,""" +
      s""""calibs":$calibJson,$refreshJson,"series":[$js]}""")
    spark.stop()
  }
}
