package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Training-data pipeline composites: the filter stage an LLM-data
  * pipeline actually runs (quality gates producing keep/drop decisions
  * with reasons), corpus statistics (frequency-of-frequencies), and
  * embedding cluster quality.
  */
object PipelineOps {

  /** Quality gate: every document scored against explicit thresholds;
    * output keeps the decision AND the first failing reason — pipelines
    * need the why for audit. One narrow pass, no shuffle; at 100 TB
    * this is a pure map stage that pushes the kept subset straight to
    * the next operator's scan.
    */
  def t06QualityFilter(s: SparkSession, d: String): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    val nTok = size(toks).cast("long")
    val uniqRatio = size(array_distinct(toks)).cast("double") / size(toks).cast("double")
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), nTok.as("n_tokens"),
        uniqRatio.as("uniq_ratio"))
      .withColumn("drop_reason",
        when(col("n_chars") < 100, "too_short")
          .when(col("n_tokens") < 20, "too_few_tokens")
          .when(col("uniq_ratio") < 0.3, "too_repetitive")
          .otherwise(lit(null).cast("string")))
      .withColumn("keep", col("drop_reason").isNull)
  }

  /** Frequency-of-frequencies (the Good–Turing spectrum): how many
    * distinct words occur exactly k times. Two partial-agg shuffles,
    * both tiny after combine.
    */
  def t07FreqSpectrum(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(filter(split(lower(col("text")), "\\s+"), x => x =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_words"))

  /** Embedding cluster quality: per label, member count and inertia
    * (sum of squared distances to the label centroid), centroid
    * computed by the SAME streamed vec_id-ordered fold as the IVF /
    * k-means paths (Similarity.cellCentroids — bounded task memory
    * however large a cell grows) — the quantities a clustering/IVF
    * training loop monitors.
    */
  def e01ClusterStats(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val members = Tables.embeddings(s, d)
      .select(col("label"), col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val centroids = graft.queries.Similarity.cellCentroids(s, members)
      .select(col("label"), col("cv"))
    members.join(broadcast(centroids), "label")
      .withColumn("dist2",
        expr("graft_sumsq(zip_with(v, cv, (x, y) -> x - y))"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), round(sum(col("dist2")), 4).as("inertia"))
  }

  /** k-NN outlier pruning — the D4-style curation stage after
    * clustering: a point whose 3rd-nearest neighbour is still far is
    * isolated (mislabeled, corrupted, off-distribution) and gets
    * pruned before training. Within each label cell, every vector's
    * cosine to its 3rd-closest cellmate is its density score; the 5
    * sparsest vectors per cell are flagged. Both ranks are total
    * orders (cosine desc/asc, vec_id) so the flags are deterministic
    * and hash-checked — engines compute identical IEEE folds (s01
    * discipline, no rounding anywhere).
    *
    * Scale shape: the pairwise join is BLOCKED by the label cell
    * (p02's pattern — fan-out bounded by cell size, never corpus
    * size), the k-th-NN rank prunes per task via WindowGroupLimit
    * under its literal k, and at 100 TB the within-cell scan is
    * replaced by the ANN shortlist (s16) with identical downstream
    * shape — the density score only needs top-k, which is what the
    * index serves.
    */
  def e02KnnOutliers(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_sumsq(v)")))
    val a = e.as("a"); val b = e.as("b")
    val wNn = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nb"))
    val knn3 = a.join(b, col("a.label") === col("b.label") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("a.label").as("label"),
        col("b.vec_id").as("nb"),
        (expr("graft_dot(a.v, b.v)") / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .withColumn("rk", row_number().over(wNn))
      .filter(col("rk") === 3) // literal -> WindowGroupLimit prunes per task
      .select(col("vec_id"), col("label"), col("cos").as("knn3_cos"))
    val wCell = Window.partitionBy(col("label"))
      .orderBy(col("knn3_cos"), col("vec_id"))
    knn3.withColumn("sparsity_rank", row_number().over(wCell).cast("long"))
      .withColumn("is_outlier", col("sparsity_rank") <= 5)
      .select(col("vec_id"), col("label"), col("knn3_cos"),
        col("sparsity_rank"), col("is_outlier"))
  }

  /** e02's cache-release registry (Dedup's contract, mirrored): e04's
    * NN-descent rounds cache per-round state the lazy result still
    * reads; the next registering build or an explicit
    * [[releaseCaches]] drops the previous blocks.
    */
  private val liveReleases =
    new scala.collection.mutable.ArrayBuffer[() => Unit]
  private def registerRelease(r: () => Unit): Unit =
    synchronized { liveReleases += r }
  def releaseCaches(): Unit = synchronized {
    liveReleases.foreach(r => r())
    liveReleases.clear()
  }

  /** e02's production twin at 100 TB — the SAME density score and flag
    * window, with the within-cell ALL-PAIRS join replaced by
    * NN-DESCENT (Dong et al., WWW'11), the standard distributed
    * all-points-kNN construction: every vector keeps a working list of
    * its K best neighbors so far, and each round proposes
    * neighbors-of-neighbors (forward edges plus a CAPPED reverse
    * expansion — see the in-loop comment; uncapped reverse lists let
    * high-dim hub nodes re-quadratize the 2-hop join) as new
    * candidates. Per-round work is ≤ 2K²·n candidate pairs — LINEAR
    * in corpus size however skewed the graph — versus the quadratic
    * Σ cell² of the blocked self-join; no join in this plan is keyed
    * on the label cell alone (the plan spec asserts exactly that, and
    * that e02 still has one).
    *
    * Everything is deterministic, so the result is hash-checked
    * against e02's UNCHANGED exact oracle: the warm start routes each
    * vector to its top-2 of 4 md5-seeded cells per label (the
    * s04/q37 deterministic-sampling idioms — at scale the seed count
    * grows with the cell so routed occupancy stays bounded), all
    * cosines are the s01 IEEE fold, and every ranking carries the
    * (cos DESC, vec_id) tie-break. Convergence to the EXACT 3-NN is a
    * fixture property, measured here at K = 24, 3 rounds: zero wrong
    * vectors at sf0.001/0.01/0.1 (K = 16 already exact below sf0.1;
    * the margin is the working-degree headroom NN-descent needs on
    * isotropic 64-d cells). The honest caveat, stated rather than
    * hidden: NN-descent converges with high probability, not by
    * proof — on adversarial geometry the kNN graph can stall, which
    * the oracle gate would surface as a hash mismatch, exactly like
    * the other measured-approximation tiers (s12's discipline). Note
    * for this corpus's geometry: rproj-16 coarse shortlists (s16's
    * tier) were measured FIRST and cover rank 3 only to depth ~217 of
    * ~220 at sf0.1 — within an isotropic cluster a 16-d sketch cannot
    * order in-cluster neighbors, so the two-stage rerank shape does
    * NOT compose here; the NN-graph iteration is the design that
    * does.
    *
    * Scale shape per round: the state is (vec_id, K neighbors) — never
    * on the driver; candidate generation is two narrow self-joins of
    * the edge list on vec_id keys; scoring joins the cached vector
    * table on vec_id (shuffle-partitioned both sides at scale);
    * WindowGroupLimit prunes the per-vector ranking under the literal
    * K. Rounds materialize eagerly (cache + count) so lineage stays
    * one round deep — the d07 loop's discipline.
    */
  /** e04's warm-start block assignment, factored for the spec that
    * pins its two load-bearing properties: (1) block occupancy is
    * bounded by a constant at ANY corpus size — nBlocks scales as
    * ceil(n_label/24), so init-pair count is linear in n; (2) the
    * UNION of the two independent random partitions connects each
    * label's init graph (one disjoint partition measured as
    * non-convergence — 2-hop expansion can never cross blocks).
    * Takes any frame with (vec_id, label); returns (vec_id, label,
    * blk) with exactly two rows per input row. */
  private[graft] def nnInitAssign(e: DataFrame): DataFrame = {
    val cnts = e.groupBy(col("label")).agg(count(lit(1)).as("nl"))
    e.join(broadcast(cnts), "label")
      .withColumn("r", explode(array(lit(1), lit(2))))
      .withColumn("blk", concat_ws("_", col("r"), pmod(
        conv(substring(md5(concat_ws("_", col("vec_id"), col("r"))),
          1, 8), 16, 10).cast("long"),
        greatest(lit(1L), ceil(col("nl") / lit(24.0)).cast("long")))))
      .select(col("vec_id"), col("label"), col("blk"))
  }

  /** Release hook for a [[nnDescent]] result: drops the final round's
    * checkpoint blocks (the lineage is truncated, so callers must fold
    * the state into an ordinary cache FIRST — see e04's ending). */
  private[graft] def nnRelease(state: DataFrame): () => Unit = {
    val rdd = graft.core.Checkpoints.checkpointedRdd(state)
    () => { rdd.foreach(_.unpersist(blocking = false)); () }
  }

  /** The NN-descent refinement loop behind e04, factored so the spec
    * can pin the CONVERGENCE contract: returns (final kNN state,
    * rounds actually submitted). `e` must carry (vec_id, v, nrm),
    * cached by the caller; `initPairs` is the candidate seed graph.
    *
    * Each round's job ALSO emits — as an observed metric riding the
    * round's own action, the s07/s08 k-means `moved` pattern, so
    * convergence detection costs no extra job, no extra join, and no
    * extra shuffle — an order-independent CHECKSUM of the state:
    * bit_xor over xxhash64(vec_id, nbrs). A repeated checksum means
    * the state is (up to a ~2⁻⁶⁴ xor-collision, which the e02 oracle
    * hash would still catch) a FIXED POINT of the capped 2-hop
    * expansion (the expansion is deterministic in the state, so an
    * unchanged state regenerates the same candidates and the same
    * top-K forever): further rounds are provably dead work, and the
    * loop exits instead of silently submitting them. The first cut of
    * this gate joined each round's lists back to the previous state
    * to COUNT changed rows — semantically identical, but the join
    * reshuffled the full 24-struct neighbor arrays every round and
    * cost e04 ~25 % at sf0.1 (measured head-to-head against the r8
    * tree on one boot); the checksum rides the existing aggregate for
    * free. Before any gate the loop burned all `maxRounds` rounds
    * unconditionally — on easy geometry pure waste (the fleet's
    * single most expensive operator at every scale), and on a stalled
    * graph it submitted dead rounds before the oracle hash caught the
    * failure anyway.
    */
  private[graft] def nnDescent(e: DataFrame, initPairs: DataFrame,
      kDeg: Int, maxRounds: Int): (DataFrame, Int) = {
    import org.apache.spark.sql.expressions.Window
    // exact-cosine top-K of a candidate pair stream, as ordered
    // (nb, cos) arrays — one row per vector
    def topK(cands: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("nb"))
      cands
        .join(e.select(col("vec_id"), col("v").as("va"), col("nrm").as("na")),
          "vec_id")
        .join(e.select(col("vec_id").as("nb"), col("v").as("vb"),
          col("nrm").as("nbn")), "nb")
        // score, then DROP both vectors before the ranking shuffle
        // (e02's own discipline): sorting rows that still carry 2×64
        // doubles is a ~40× wider exchange for nothing
        .select(col("vec_id"), col("nb"),
          (expr("graft_dot(va, vb)") / (col("na") * col("nbn"))).as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= kDeg) // literal -> WindowGroupLimit per task
        .groupBy(col("vec_id"))
        .agg(expr("transform(array_sort(collect_list(struct(rk, nb, cos)))," +
          " x -> struct(x.nb AS nb, x.cos AS cos))").as("nbrs"))
    }
    // Per-round lineage truncation via the d07 loop's discipline: a
    // round references its edge frame THREE times (both 2-hop sides +
    // the 1-hop union), so an untruncated logical plan grows ~3× per
    // round and ANALYSIS/cache-matching cost goes exponential — the
    // data is tiny but planning alone reached ~20 s by round 3
    // (measured). roundCheckpoint (localCheckpoint; reliable files
    // under spark.graft.checkpointDir) resets the plan to a leaf.
    // the state checksum (see the contract above): observed on every
    // materialization, INCLUDING the init state — round 1's equality
    // test needs the init's checksum, and observing it here rides the
    // checkpoint action that runs anyway
    def chkCol = expr("bit_xor(xxhash64(vec_id, nbrs))").as("chk")
    // the row count rides the SAME observe as a second invariant: a
    // bit_xor collision between two different states (~2^-64) would
    // need the states to ALSO hold equal vector counts to slip the
    // gate — one more aggregate on an action already running, zero
    // extra jobs
    def cntCol = count(lit(1)).as("cnt")
    def stateSig(o: org.apache.spark.sql.Observation) =
      (Option(o.get("chk")), o.get("cnt"))
    val obs0 = org.apache.spark.sql.Observation(
      s"nnd_init_${System.nanoTime()}")
    var state = graft.core.Checkpoints.roundCheckpoint(
      topK(initPairs).observe(obs0, chkCol, cntCol))
    var prevChk = stateSig(obs0) // chk None ⇔ empty state
    var release: () => Unit = nnRelease(state)
    // cap maxRounds (4 in e04): random init starts one hop "colder"
    // than the retired geometric seeding — per-round cost is linear,
    // so the cap trades a bounded constant for the removal of the
    // quadratic init (measured 17.2× → linear at the 10× probe). The
    // convergence gate usually exits earlier.
    var rounds = 0
    var converged = false
    while (rounds < maxRounds && !converged) {
      val ed = state.select(col("vec_id").as("src"),
        explode(expr("transform(nbrs, x -> x.nb)")).as("dst"))
      // CAPPED reverse expansion (the NN-descent paper's reverse
      // sampling): a refined kNN graph grows hub nodes (high-dim
      // hubness), and an uncapped symmetrized 2-hop join fans out as
      // Σ in(m)·out(m) — quadratic in hub degree (measured: round 3
      // cost 7× round 1 on identical row counts before the cap). Per
      // node keep the K reverse sources with smallest id
      // (deterministic), so every node's expansion degree is ≤ 2K
      // and the join product is ≤ 2K²·n however skewed the graph.
      val wRev = Window.partitionBy(col("src")).orderBy(col("dst"))
      val rev = ed.select(col("dst").as("src"), col("src").as("dst"))
        .withColumn("rr", row_number().over(wRev))
        .filter(col("rr") <= kDeg).drop("rr")
      val out = ed.union(rev).distinct()
      val non = out.as("x").join(out.as("y"), col("x.dst") === col("y.src"))
        .select(col("x.src").as("vec_id"), col("y.dst").as("nb"))
        .filter(col("vec_id") =!= col("nb"))
        .union(out.select(col("src").as("vec_id"), col("dst").as("nb")))
        .distinct()
      // the convergence checksum rides the checkpoint's own action —
      // no join against the previous state (see the contract above).
      // xxhash64 of (vec_id, nbrs) is exact on the list identity: the
      // arithmetic is deterministic per pair, so an unchanged list
      // hashes equal, and bit_xor is order-independent over the
      // one-row-per-vec_id aggregate.
      val obs = org.apache.spark.sql.Observation(
        s"nnd_r${rounds}_${System.nanoTime()}")
      val next = topK(non).observe(obs, chkCol, cntCol)
      // roundCheckpoint is eager, so the new state is materialized
      // before the previous round's blocks release
      state = graft.core.Checkpoints.roundCheckpoint(next)
      val chk = stateSig(obs)
      converged = chk == prevChk
      prevChk = chk
      release()
      release = nnRelease(state)
      rounds += 1
    }
    (state, rounds)
  }

  def e04KnnOutliersAnn(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExpressions.register(s)
    val kDeg = 24
    releaseCaches()
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_sumsq(v)")))
      .cache()
    registerRelease(() => e.unpersist())
    // ---- warm start: random BOUNDED blocks within each label (the
    // NN-descent paper's random-init kNN, made deterministic via
    // md5): nBlocks = ceil(n_label/24) per assignment round, so block
    // occupancy stays ~24 at ANY corpus size and — with two blocks
    // per vector — each vector starts with ~2·24 ≈ 48 init
    // candidates, so init-pair count is ~48·n — LINEAR. The earlier 4-fixed-seed cell routing was this
    // operator's one super-linear stage, caught by the 10× probe at
    // 17.2× for 10× data: with seed count fixed, cell occupancy (and
    // with it both the seed-scoring join and the within-cell pair
    // count) grows linearly with n_label, so the warm start alone
    // re-quadratizes exactly the way the blocked self-join the
    // operator replaces does. Random blocks trade init quality for
    // linear cost; the descent rounds recover the geometry (exactness
    // vs e02's oracle is unchanged — gate-checked at all three sfs,
    // and the 10× ratio drops to ~linear).
    val assign = nnInitAssign(e)
    val initPairs = assign
      .join(assign.select(col("vec_id").as("nb"), col("label"), col("blk")),
        Seq("label", "blk"))
      .filter(col("vec_id") =!= col("nb"))
      .select(col("vec_id"), col("nb")).distinct()
    val (state, _) = nnDescent(e, initPairs, kDeg, maxRounds = 4)
    val release = nnRelease(state)
    // Fold the small result into an ordinary cache and drop the final
    // checkpoint blocks NOW (d07's ending): a truncated lineage cannot
    // recompute, so handing a checkpoint-backed frame to a registry
    // that releases on the next build would turn later re-evaluation
    // into a hard "block not found" failure rather than a perf loss.
    val wRank = Window.partitionBy(col("label"))
      .orderBy(col("knn3_cos"), col("vec_id"))
    val result = state
      .select(col("vec_id"), expr("nbrs[2].cos").as("knn3_cos"))
      .join(e.select(col("vec_id"), col("label")), "vec_id")
      .withColumn("sparsity_rank", row_number().over(wRank).cast("long"))
      .withColumn("is_outlier", col("sparsity_rank") <= 5)
      .select(col("vec_id"), col("label"), col("knn3_cos"),
        col("sparsity_rank"), col("is_outlier"))
      .cache()
    result.count()
    release()
    registerRelease(() => { result.unpersist(); () })
    result
  }

  /** Deterministic hash sampling — THE reproducible way to subsample
    * training data (rand()-based sampling cannot be replayed or
    * audited). Content-hash modulus keeps ~10%; the same document is
    * always in or always out, across runs, engines and partitionings.
    */
  def q37HashSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("h", conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10).cast("long"))
      .filter(col("h") % 10 === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))

  /** The END-TO-END corpus build — quality gate → near-dup cluster
    * resolution → per-language cap, composed from the engine's own
    * operators exactly as a user would chain them:
    *
    *   1. t06's quality gate keeps documents passing all thresholds
    *      (narrow map);
    *   2. d07's distributed connected components resolve near-dup
    *      clusters; non-canonical members drop via a LeftAnti join
    *      (the dedup DECISION, not just detection);
    *   3. q48's deterministic md5-order cap balances languages at 50
    *      docs each.
    *
    * Output: the final kept set with its per-language rank — the
    * training corpus manifest. Every stage is the 100 TB design of
    * its standalone operator; the composition adds one LeftAnti and
    * one broadcast-sized join.
    */
  def p01CorpusBuild(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quality = t06QualityFilter(s, d).filter(col("keep")).select(col("doc_id"))
    val losers = graft.queries.Dedup.d07DupClusters(s, d)
      .filter(!col("is_canonical")).select(col("doc_id"))
    val kept = quality.join(losers, Seq("doc_id"), "left_anti")
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    kept.join(Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 50)
      .select(col("doc_id"), col("lang"), col("rk"))
  }

  /** EMBEDDING-SPACE corpus curation (the SemDeDup shape): p01's text
    * capstone replayed in vector space. Semantic near-dups (cosine ≥
    * 0.35) are detected ONLY within a coarse cluster — the economy
    * that makes embedding dedup affordable at 100 TB: |cells| ×
    * (n/k)² comparisons instead of n², with the cells coming from the
    * k-means build (s08's loop; here the stored `label`). Pairs are
    * transitive evidence, so the d07 connected-components machinery
    * resolves clusters and the non-canonical members are dropped via
    * LeftAnti — every stage is a standalone operator's audited scale
    * design, composed exactly as a curation pipeline would chain them.
    * Output: the KEPT rows (vec_id, cell), oracle-checked against a
    * recursive-CTE closure over the same pair domain.
    */
  def p02SemDedup(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(expr("graft_sumsq(v)")))
    val a = e.as("a"); val b = e.as("b")
    val pairs = a.join(b, col("a.label") === col("b.label") &&
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine",
        expr("graft_dot(a.v, b.v)") / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= 0.35)
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"))
    val nonCanon = Dedup.connectedComponents(pairs)
      .filter(col("node") =!= col("label"))
      .select(col("node").as("vec_id"))
    Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      .join(nonCanon, Seq("vec_id"), "left_anti")
  }

  /** CORPUS MIXING to a per-source budget — the "data mixing" step of
    * every pretraining corpus build: each source gets a target share
    * (weights here derived deterministically from the source name —
    * stand-ins for the 30 % web / 30 % code /… recipe), and documents
    * fill the share greedily in reproducible md5 order until the
    * budget is met. A source can end BUDGET-CAPPED (docs left over) or
    * EXHAUSTED (budget unreached) — both paths occur on these
    * fixtures and both matter operationally: exhausted sources are
    * what forces a recipe renegotiation. Output is the mixing
    * manifest: per source, docs taken, chars used, and the budget.
    *
    * Scale shape — TWO-LEVEL PREFIX SUM, never a per-source row-order
    * window (a 100 TB source would be one giant unbounded partition;
    * unlike q48 there is no WindowGroupLimit pushdown for a resource
    * cap). The md5 order key is bucketed by its high 5 bits into 32
    * contiguous h-ranges, so bucket order IS row order coarsened:
    *   1. per-(source, bucket) count/char subtotals — the only
    *      corpus-wide shuffle, partial-aggable;
    *   2. a running sum over the ≤32 subtotal rows per source
    *      classifies each bucket: wholly inside the budget, wholly
    *      beyond it, or THE boundary bucket (≤1 per source);
    *   3. only boundary-bucket rows (1/32 of one source, via a
    *      broadcast of the tiny boundary list) get the row-order
    *      running sum, offset by the chars before the bucket — its
    *      window partitions by (source, bucket), bounded by
    *      construction (at 100 TB, widen to h's high k bits so a
    *      bucket fits a task);
    *   4. wholly-in buckets contribute count/chars from their
    *      SUBTOTALS alone — per-row cums are never computed for them.
    * Same answer as the direct window (the filter cum ≤ budget
    * decides whole buckets identically on both paths), plan-asserted
    * to contain no (source)-partitioned row-order window.
    */
  def p03MixToBudget(s: SparkSession, d: String): DataFrame =
    mixToBudget(Tables.documents(s, d)
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("budget",
        (lit(3000L) * (lit(1L) + (ascii(substring(col("source"), -1, 1)) % 3)))
          .cast("long")))

  /** The two-level fill over any (source, doc_id, n_chars, h, budget)
    * frame with h ∈ [0, 2³²) — package-visible so the spec can assert
    * two-level == direct-window on randomized synthetic corpora
    * (including budgets landing exactly on bucket boundaries).
    */
  private[graft] def mixToBudget(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = rows
      .withColumn("bkt", shiftright(col("h"), 27)) // h < 2³² → 32 contiguous ranges
      .select(col("source"), col("doc_id"), col("n_chars"),
        col("h"), col("budget"), col("bkt"))
    val stats = base.groupBy(col("source"), col("bkt"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sub"),
        first(col("budget")).as("budget"))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = stats.withColumn("cum_end", sum(col("sub")).over(wSrc))
      .withColumn("cum_before", col("cum_end") - col("sub"))
    val allIn = cum.filter(col("cum_end") <= col("budget"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_docs"), max(col("cum_end")).as("chars_used"),
        first(col("budget")).as("char_budget"))
    val boundary = cum
      .filter(col("cum_end") > col("budget") && col("cum_before") <= col("budget"))
      .select(col("source"), col("bkt"), col("cum_before"))
    val wBkt = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryAgg = base.join(broadcast(boundary), Seq("source", "bkt"))
      .withColumn("cum", col("cum_before") + sum(col("n_chars")).over(wBkt))
      .filter(col("cum") <= col("budget"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("cum")).as("chars_used"),
        first(col("budget")).as("char_budget"))
    allIn.unionByName(boundaryAgg)
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"), max(col("chars_used")).as("chars_used"),
        first(col("char_budget")).as("char_budget"))
  }

  /** Leakage-safe train/validation/test split: assignment is atomic
    * per NEAR-DUP CLUSTER (d07's connected components), not per
    * document — if any member of a cluster lands in train, every
    * member does, so no eval document has a near-duplicate sitting in
    * the training set (the split-leakage failure eval post-mortems
    * keep finding). Unclustered docs are their own group. The split
    * hash runs on the GROUP id (q37's reproducible md5 idiom),
    * 8/1/1 train/validation/test, so re-running the pipeline — or
    * adding documents that don't join an existing cluster — never
    * reshuffles prior assignments.
    *
    * Scale shape: cluster labels exist only for docs touched by a
    * near-dup pair (a small minority of any deduped corpus), d07's
    * banded-candidate + pointer-jump machinery is reused as-is, and
    * the label join back to documents is one equi-join on doc_id
    * (broadcastable when the pair graph is small); the hash + split
    * derivation is a narrow map. No new shuffle beyond d07's own.
    */
  def p04LeakSafeSplit(s: SparkSession, d: String): DataFrame = {
    val labels = Dedup.d07DupClusters(s, d)
      .select(col("doc_id"), col("cluster_id"))
    Tables.documents(s, d).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket",
        conv(substring(md5(col("group_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 10)
      .select(col("doc_id"), col("group_id"),
        when(col("bucket") < 8, "train")
          .when(col("bucket") === 8, "validation")
          .otherwise("test").as("split"))
  }

  /** Temperature-weighted source sampling — the OTHER half of the
    * mixing recipe next to p03's absolute budgets: quotas derive from
    * the source sizes themselves, w_s ∝ n_s^τ with τ = 0.5 (the
    * XLM-R/mT5 upsampling trick — flatter than proportional, so
    * small sources are over-represented without a hand recipe), and a
    * fixed total budget of 300 documents is split as
    * quota_s = ⌊B·w_s/Σw⌋. Every arithmetic step is exact: IEEE sqrt
    * is correctly rounded (identical bits in both engines), pinned to
    * a scaled BIGINT (round·10⁶), and the quota is one BIGINT
    * multiply + integer division — no float sum ever occurs, so
    * there is no ordering hazard at all (contrast t16's rounded fit).
    * Output is the per-document take: reproducible md5-order rank
    * within source, kept while rank ≤ quota.
    *
    * Scale shape: source stats are one partial-aggable shuffle of
    * |sources| rows; the quota table broadcasts. The per-source rank
    * wears q48's discipline — the literal `rank ≤ 400` ceiling (a
    * recipe constant ≥ any quota, asserted in the spec) sits DIRECTLY
    * above the window so WindowGroupLimit prunes each task to its
    * local top-400 before the exchange; the data-dependent
    * `rank ≤ quota` cut then runs on ≤400 rows/source. At 100 TB the
    * ceiling is the recipe's max-per-source take — already part of
    * real mixing configs.
    */
  def p05TemperatureMix(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val doc = Tables.documents(s, d)
    val stats = doc.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("w", round(sqrt(col("n_docs").cast("double")) * lit(1e6))
        .cast("long"))
    val tot = stats.agg(sum(col("w")).as("sw"))
    val quotas = stats.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        expr("(300L * w) div sw").as("quota")) // BIGINT div: exact floor
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    val ranked = doc
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 400) // literal ceiling -> WindowGroupLimit
    ranked.join(broadcast(quotas), "source")
      .filter(col("rank") <= col("quota"))
      .select(col("source"), col("doc_id"),
        col("rank").cast("long").as("rank"), col("quota"))
  }

  /** Distribution drift between two corpus splits — the population
    * stability index (PSI) over the language marginal, the gate a
    * training pipeline runs before accepting a refreshed snapshot or
    * comparing train vs held-out ("did the mix move?"; PSI < 0.1 is
    * the conventional all-clear). Splits are q37's deterministic
    * doc_id-hash halves, so the drift being measured is itself
    * replayable. Shape: ONE conditional-count shuffle on lang (both
    * split marginals partial-agg in the same pass — no second scan,
    * no join of two aggregations), totals ride a 1-row broadcast.
    * Each language's PSI term (p_a−p_b)·ln(p_a/p_b) is pinned to a
    * scaled BIGINT (the t17/t18 discipline): the corpus-level PSI in
    * the `_total` row is then an exact integer sum, order-free and
    * bit-identical in both engines. One-sided languages (present in
    * a single split) emit NULL terms and are excluded from the total
    * — flagged, not epsilon-fudged.
    */
  def e03DistributionDrift(s: SparkSession, d: String): DataFrame =
    psiFromCounts(Tables.documents(s, d)
      .withColumn("split",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2)
      .groupBy(col("lang"))
      .agg(sum(when(col("split") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("split") === 1, 1L).otherwise(0L)).as("n_b")))

  /** e03's PSI tail over any (lang, n_a, n_b) marginal frame —
    * package-visible so st19 can run the identical arithmetic on
    * marginals maintained BY A STREAM and share e03's oracle.
    */
  private[graft] def psiFromCounts(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    val terms = counts.crossJoin(broadcast(tot))
      .withColumn("p_a", col("n_a").cast("double") / col("ta").cast("double"))
      .withColumn("p_b", col("n_b").cast("double") / col("tb").cast("double"))
      .withColumn("psi_scaled", when(col("n_a") > 0 && col("n_b") > 0,
        round((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b")) * 1e9)
          .cast("long")))
      .select(col("lang"), col("n_a"), col("n_b"), col("psi_scaled"))
    val total = terms.agg(sum(col("n_a")).as("n_a"), sum(col("n_b")).as("n_b"),
        sum(col("psi_scaled")).as("psi_scaled"))
      .select(lit("_total").as("lang"), col("n_a"), col("n_b"),
        col("psi_scaled"))
    terms.unionByName(total)
  }

  /** Training-shard manifest — the last-mile packing step a dataloader
    * reads: documents dealt to 16 shards by size-descending
    * round-robin (the deterministic greedy that keeps shard byte
    * totals near-equal without any sequential bin-packing state).
    * The global size ranking is q64's twoLevelRank core with a single
    * group — the case a naive window turns into ONE task for the
    * whole corpus, and exactly where the value-range buckets keep
    * every window partition bounded. Shard id is then pure arithmetic
    * on the rank; the output is the per-shard manifest row (count +
    * byte total) whose spread IS the balance check.
    */
  def p06ShardManifest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(lit("all").as("g"),
        (-col("n_chars")).cast("double").as("v"), // size-DESC via negation
        col("doc_id"), col("n_chars"))
    graft.queries.Relational10.twoLevelRank(docs, Seq(col("doc_id")))
      .withColumn("shard", (col("rnk") - 1) % 16)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
  }

  /** Z-order (Morton) layout board — the 2-D data-skipping layout a
    * 100 TB lake clusters files by. A single sort key (ship-day) makes
    * parquet row-group min/max stats selective for ONE dimension and
    * useless for every other; interleaving the bits of two normalized
    * dimensions (ship-day × partkey here) gives a 1-D key whose ranges
    * are small 2-D tiles, so min/max footer stats prune scans for
    * predicates on EITHER column. At 100 TB the layout write is
    * `repartitionByRange(zval).sortWithinPartitions(zval)` — a single
    * range shuffle at ingest, amortized over every later scan.
    *
    * This board quantifies the claim with exact integer arithmetic:
    * both dims normalized to 8-bit grids via bounds from one 1-row
    * aggregate (broadcast back — the scalar-stats idiom), bits
    * interleaved into a 16-bit Morton code, the curve cut into 64
    * equal z-ranges (the stand-ins for row groups), and each range's
    * min/max extent per dimension reported — the footer stats a reader
    * would prune on. `ZorderLayoutSpec` turns the extents into the
    * decision number: buckets prunable for a partkey predicate under
    * z-order vs under the 1-D ship-day sort (where partkey extents
    * span the whole axis). Everything is integer or exactly-
    * representable double arithmetic — hash-identical cross-engine.
    */
  def p07ZorderLayout(s: SparkSession, d: String): DataFrame = {
    val src = Tables.lineitem(s, d).select(
      datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d1"),
      col("l_partkey").as("d2"))
    val bounds = src.agg(
      min(col("d1")).as("lo1"), max(col("d1")).as("hi1"),
      min(col("d2")).as("lo2"), max(col("d2")).as("hi2"))
    // (d-lo)*256 ≤ ~1.5e8 and the divisor ≤ ~2e5: both ≪ 2^53, so the
    // double divide + floor is exact in every IEEE engine.
    def grid(v: Column, lo: Column, hi: Column): Column =
      floor((v - lo).cast("double") * lit(256.0) /
        (hi - lo + lit(1L)).cast("double")).cast("long")
    val z = (0 until 8).map { i =>
      shiftleft(shiftright(col("b1"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(col("b2"), i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
    src.crossJoin(broadcast(bounds))
      .withColumn("b1", grid(col("d1"), col("lo1"), col("hi1")))
      .withColumn("b2", grid(col("d2"), col("lo2"), col("hi2")))
      .withColumn("zbucket", floor(z.cast("double") / lit(1024.0)).cast("long"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("b1")).as("b1_lo"), max(col("b1")).as("b1_hi"),
        min(col("b2")).as("b2_lo"), max(col("b2")).as("b2_hi"))
  }

  /** Distributed quality-classifier training — full-batch logistic
    * regression by gradient descent in the aggregate-broadcast shape
    * the k-means loop (s08) established: per round, every document
    * contributes three integer-pinned gradient terms to ONE partial
    * aggregate (map-side combine → a single 1-row result), the weight
    * update is exact integer arithmetic on that row, and the new
    * weights re-enter the plan as three literals. Documents never
    * shuffle; per-round cluster traffic is one row regardless of
    * corpus size — the shape that trains a fastText-style quality
    * gate over 100 TB without moving the corpus.
    *
    * Cross-engine exactness is t17's discipline: each per-document
    * gradient/loss term is pinned to a scaled BIGINT BEFORE the sum,
    * so accumulation is order-free and the weight trajectory is a
    * deterministic function of exact integer sums (the one double
    * step, lr·S/n, has both operands ≪ 2^53). The DuckDB oracle
    * replays the identical three iterations as chained 1-row CTEs.
    * Features: bias, n_chars/1000, whitespace-token count/100, and
    * the t02 English-stopword intersect/10 (the one carrying the
    * signal); target: lang == 'en'. Output: per-iteration scaled
    * weights and pinned training loss — the trajectory a training
    * job monitors.
    */
  def e05LrQualityTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val feats = lrFeatures(s, d).cache()
    val trajectory = lrTrain(feats)._1
    feats.unpersist()
    trajectory.toDF("iter", "w0", "w1", "w2", "w3", "loss_scaled")
  }

  /** (doc_id, y, x1, x2, x3) — the classifier's feature frame, shared
    * by the training loop (e05) and the inference gate (e06). x3 is
    * the t02 English-stopword intersect — the feature that separates
    * languages on real text. Honest fixture note: this synthetic
    * corpus draws text independently of the lang label (measured:
    * mean stopword hits 1.50 for en vs 1.62 for non-en), so
    * majority-class IS the Bayes optimum here and the trained gate
    * converges to it; what the oracle certifies is the TRAINING
    * MACHINERY (exact distributed gradients, deterministic weight
    * trajectory, calibrated loss descent), not fixture separability.
    * That the same machinery LEARNS when signal exists is the
    * affirmative spec in EngineSpec ("the LR gate LEARNS…"): on a
    * stopword-enriched planted corpus the identical loop drives loss
    * well below the prior's entropy and accuracy ≈ 1.0 vs a 0.5
    * prior.
    */
  private def lrFeatures(s: SparkSession, d: String): DataFrame =
    // spread: the feature map tokenizes text per row and the
    // single-file fixture would run it (and each GD round's re-scan
    // when uncached) in one task — TextOps.sdoc's rationale
    lrFeaturesOf(Tables.spread(Tables.documents(s, d)))

  /** The feature map over ANY (doc_id, lang, n_chars, text) frame —
    * factored so the planted-signal spec trains on a synthetic corpus
    * through the exact production path. */
  private[graft] def lrFeaturesOf(docs: DataFrame): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    docs.select(
      col("doc_id"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      (col("n_chars").cast("double") / lit(1000.0)).as("x1"),
      (size(toks).cast("double") / lit(100.0)).as("x2"),
      (size(array_intersect(array_distinct(toks),
        array(lit("the"), lit("a"), lit("and"), lit("of"), lit("to"))))
        .cast("double") / lit(10.0)).as("x3"))
  }

  /** The sigmoid under the scaled-integer weights. */
  private[graft] def lrSigmoid(w: Array[Long]): Column = {
    val m = lit(w(0).toDouble / 1e6) +
      lit(w(1).toDouble / 1e6) * col("x1") +
      lit(w(2).toDouble / 1e6) * col("x2") +
      lit(w(3).toDouble / 1e6) * col("x3")
    lit(1.0) / (lit(1.0) + exp(-m))
  }

  /** GD rounds over the feature frame (3 at lr 0.5 for the oracle
    * gates — the DuckDB CTE chain replays exactly those; the
    * planted-signal spec passes more rounds / a hotter lr to drive
    * the same loop to separation); returns the trajectory rows
    * (iter, w0, w1, w2, w3, loss_scaled) and the final weights.
    * Pairing convention, mirrored exactly by the oracle CTEs: row i
    * carries the weights AFTER update i next to the loss evaluated
    * under the weights ENTERING iteration i (so row 1's loss is the
    * w=0 closed form n·round(ln 2·1e6) — the spec pins this).
    *
    * Residual ulp risk, documented: the per-document terms pass
    * through exp/log BEFORE pinning, and JVM Math.exp/log are not
    * correctly rounded — a term whose fractional part sits within an
    * ulp of .5 could round differently from DuckDB's libm and shift a
    * weight by 1e-6. Unlike the order-free-sum discipline this cannot
    * be engineered away without fixed-point transcendentals; instead
    * the spec ("lrTrain's pinned terms stay clear of the .5 rounding
    * boundary") measures the minimum boundary distance across every
    * pinned term of all three oracle iterations on the fixtures, so a
    * fixture or feature change that creates a knife-edge term fails
    * loudly instead of flaking the shared-oracle hashes.
    */
  private[graft] def lrTrain(feats: DataFrame, iters: Int = 3, lr: Double = 0.5)
      : (Seq[(Int, Long, Long, Long, Long, Long)], Array[Long]) = {
    def halfUp(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    var w = Array(0L, 0L, 0L, 0L) // scaled 1e6
    val trajectory = (1 to iters).map { it =>
      val p = lrSigmoid(w)
      def g(x: Column) = sum(round((p - col("y")) * x * lit(1e6)).cast("long"))
      val r = feats.agg(g(lit(1.0)).as("s0"), g(col("x1")).as("s1"),
        g(col("x2")).as("s2"), g(col("x3")).as("s3"),
        sum(round(-(col("y") * log(p) +
          (lit(1.0) - col("y")) * log(lit(1.0) - p)) * lit(1e6))
          .cast("long")).as("sl"),
        count(lit(1)).as("n")).head()
      val n = r.getLong(5)
      w = Array(w(0) - halfUp(lr * r.getLong(0) / n),
        w(1) - halfUp(lr * r.getLong(1) / n),
        w(2) - halfUp(lr * r.getLong(2) / n),
        w(3) - halfUp(lr * r.getLong(3) / n))
      (it, w(0), w(1), w(2), w(3), r.getLong(4))
    }
    (trajectory, w)
  }

  /** The inference gate e05's weights exist FOR: score every document
    * with the trained classifier and emit the keep/drop decision —
    * train-then-deploy as one composed pipeline. Training runs its
    * three 1-row aggregates; scoring is then a PURE MAP with the
    * weights as three literals (no join, no shuffle, no driver state
    * beyond 24 bytes of weights) — at 100 TB the gate streams through
    * the corpus at scan speed. Scores pin to scaled BIGINTs for the
    * cross-engine hash; the oracle re-derives the identical weights
    * via e05's CTE chain and scores in one extra SELECT.
    */
  def e06LrQualityScore(s: SparkSession, d: String): DataFrame =
    lrScoreCols(lrScored(s, d))

  /** e06's output projection over any scored (doc_id, y, …, p) frame —
    * shared with the streaming deployment (st23) so the gate's
    * columns cannot drift between batch and stream. */
  private[graft] def lrScoreCols(scored: DataFrame): DataFrame =
    scored.select(col("doc_id"),
      round(col("p") * lit(1e6)).cast("long").as("p_scaled"),
      (col("p") >= lit(0.5)).as("pred_en"),
      (col("y") === lit(1.0)).as("is_en"))

  /** Train on the corpus and hand back only the final weights —
    * st23's batch-side preamble (24 bytes of driver state). */
  private[graft] def lrTrainedWeights(s: SparkSession, d: String): Array[Long] = {
    val feats = lrFeatures(s, d).cache()
    val w = lrTrain(feats)._2
    feats.unpersist()
    w
  }

  /** Score ANY documents frame under fixed weights — the pure map
    * each micro-batch of the streaming gate runs. */
  private[graft] def lrScoreWith(docs: DataFrame, w: Array[Long]): DataFrame =
    lrScoreCols(lrFeaturesOf(docs).withColumn("p", lrSigmoid(w)))

  /** Train (cached feature frame), then score every document under
    * the final weights — the shared preamble of the inference gate
    * (e06) and the calibration board (e07), factored so the scoring
    * expression cannot drift between them (the lrTrainCtes rationale,
    * on the engine side).
    */
  private def lrScored(s: SparkSession, d: String): DataFrame = {
    val feats = lrFeatures(s, d).cache()
    val w = lrTrain(feats)._2
    feats.unpersist() // scoring below re-derives features in its own single scan
    feats.withColumn("p", lrSigmoid(w))
  }

  /** Weighted sampling WITHOUT replacement in one pass — the
    * Efraimidis–Spirakis A-ES design: each doc draws a deterministic
    * uniform u from its md5 (the q37/e03 hash-split idiom) and ranks
    * by key u^(1/w) with w = n_chars; the global top-k IS an exact
    * weighted sample without replacement. Ranking uses the monotone
    * log form ln(u)/w, pinned to a scaled BIGINT so the cross-engine
    * comparison is exact, with doc_id breaking boundary ties.
    *
    * Scale shape: a pure map then TakeOrderedAndProject — per-task
    * top-k before one tiny final merge, never a global sort; p05's
    * quota mix needs a per-source pass, this needs none. The sample
    * provably skews toward heavy docs (spec asserts the sample's mean
    * n_chars exceeds the corpus mean).
    */
  def p08WeightedSample(s: SparkSession, d: String): DataFrame =
    aesTop100(aesKeyed(Tables.documents(s, d)))

  /** The A-ES key over any documents frame — package-visible so the
    * streaming gate (st22) computes the IDENTICAL key per batch.
    */
  private[graft] def aesKeyed(docs: DataFrame): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("double") + lit(1.0)) / lit(16777217.0)
    val key = round(log(u) / col("n_chars").cast("double") * lit(1e9)).cast("long")
    docs
      // w = 0 means "never sample", and ln(u)/0 diverges between
      // engines (Spark -Inf, DuckDB NULL) — exclude zero weights
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("lang"), col("n_chars"), key.as("key_scaled"))
  }

  /** The global sample = top-100 by (key desc, doc_id). */
  private[graft] def aesTop100(keyed: DataFrame): DataFrame =
    keyed.orderBy(col("key_scaled").desc, col("doc_id")).limit(100)

  /** e08: dedup-aware NEGATIVE SAMPLING for contrastive/embedding
    * training — for each anchor document, k=3 deterministic negatives
    * that are (a) real corpus documents, (b) not the anchor, and
    * (c) not in the anchor's near-dup cluster (d07's connected
    * components): a near-dup drawn as a "negative" is a false
    * negative that actively corrupts a contrastive objective, so the
    * sampler must be dedup-aware — the reason this op belongs to the
    * dedup family rather than plain sampling.
    *
    * Scale shape — rejection sampling with DETERMINISTIC draws, never
    * a corpus fan-out: each anchor derives 8 candidate ids from
    * md5(anchor, j) (the q37/p08 reproducible-uniform idiom), which
    * are then validated by one existence semi-join against the doc-id
    * set and two label lookups against the (pair-graph-sized,
    * broadcastable) cluster labels; survivors rank by draw order and
    * the first 3 win. Work is O(anchors × draws) — independent of
    * corpus size beyond the joins — and re-running the pipeline
    * yields byte-identical samples (md5-keyed, no RNG state). The
    * 8-draw slack over k=3 makes under-filling a ~0 event (rejects
    * are the anchor itself or its ≤ cluster-size near-dups out of N
    * ids). The oracle replays the identical draws, exclusions, and
    * (j, cand_id) ranking in DuckDB over d07's own cluster CTE.
    *
    * Draw domain: ranks 0..n-1 over a DENSE-RANK side table of the
    * doc ids (md5 % n → rank → doc_id), so every document — id 0 and
    * anything behind id-space holes included — is drawn with exactly
    * probability 1/n. (The earlier `1 + md5 % max(doc_id)` form could
    * never draw id 0 and discarded holes rather than redistributing —
    * an accepted ~1/N skew that r7's verdict asked to retire.) The
    * rank table is built with a distributed sort + per-partition
    * offset zip (zipWithIndex), NOT a single-partition row_number
    * window — the one-reducer shape that dies at 100 TB; it is
    * corpus-sized, so the rank join shuffles on rk like any key join
    * and the oracle mirrors it with a row_number CTE.
    */
  def e08NegativeSampling(s: SparkSession, d: String): DataFrame =
    negativeSample(s, Tables.documents(s, d).select(col("doc_id")),
      Dedup.d07DupClusters(s, d).select(col("doc_id"), col("cluster_id")))

  /** The e08 sampler over any (doc_id) universe and (doc_id,
    * cluster_id) exclusion labels — factored so the spec can pin the
    * full-domain law (id 0 is sampleable) on a synthetic corpus.
    */
  private[graft] def negativeSample(s: SparkSession, docsIn: DataFrame,
      labels: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val docs = docsIn.select(col("doc_id"))
    // 1-row bound for the modulus — the aggregate-broadcast idiom
    val n = docs.count()
    val ranked = docs.orderBy(col("doc_id")).rdd
      .map(_.getLong(0)).zipWithIndex()
      .toDF("cand_id", "rk")
    val anchors = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("anchor_id"))
    val draws = anchors
      .withColumn("j", explode(expr("sequence(1, 8)")))
      .withColumn("rk",
        conv(substring(md5(concat_ws("_", col("anchor_id"), col("j"))
          .cast("binary")), 1, 12), 16, 10).cast("long") % lit(n))
      .join(ranked, Seq("rk"))
      .filter(col("cand_id") =!= col("anchor_id"))
    val survivors = draws
      .join(broadcast(labels.select(col("doc_id").as("anchor_id"),
        col("cluster_id").as("ca"))), Seq("anchor_id"), "left")
      .join(broadcast(labels.select(col("doc_id").as("cand_id"),
        col("cluster_id").as("cb"))), Seq("cand_id"), "left")
      .filter(col("ca").isNull || col("cb").isNull || col("ca") =!= col("cb"))
      // two draws can hit the same id — keep the earliest, so the
      // rank below is a deterministic function of the corpus
      .groupBy(col("anchor_id"), col("cand_id")).agg(min(col("j")).as("j"))
    survivors
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(col("anchor_id"))
          .orderBy(col("j"), col("cand_id"))).cast("long"))
      .filter(col("neg_rank") <= 3)
      .select(col("anchor_id"), col("neg_rank"), col("cand_id").as("neg_id"))
  }

  /** e10: the split-contamination AUDIT — p04's leakage-safety claim
    * turned into a measured number. Both split policies run over the
    * same corpus: the shipped cluster-atomic split (p04 — whole d07
    * near-dup clusters assigned together) and the naive per-doc hash
    * split it exists to replace. For each, the audit counts test
    * documents sharing ≥1 five-gram with ANY train document and the
    * total leaked (test-doc, gram) pairs — the d09 decontamination
    * machinery pointed at the pipeline's own split boundary. The
    * cluster-atomic row must dominate: near-dup pairs are exactly the
    * gram-sharing pairs a per-doc hash scatters across the boundary
    * (the spec asserts the strict inequality on the fixtures).
    * Residual atomic contamination is the honest remainder — docs
    * sharing spans BELOW the near-dup threshold, which no
    * split policy at this granularity removes.
    *
    * Measured (sf0.1): cluster-atomic 143 contaminated test docs /
    * 181 leaked gram-pairs vs naive 170 / 1980 — the atomic split
    * cuts leaked gram mass ~10×; the surviving 181 ride sub-threshold
    * span sharing, exactly the d03-regime remainder d18 character-
    * izes. The spec asserts the dominance at every sf.
    *
    * Scale shape: one gram explode + distinct (d09's cost), two
    * broadcast split maps, per-mode train-gram semi-joins — all
    * partial-aggable; nothing quadratic, nothing driver-side.
    */
  def e10SplitContamination(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    releaseCaches()
    val atomic = p04LeakSafeSplit(s, d)
      .select(col("doc_id"), col("split").as("a_split"))
    val naive = Tables.documents(s, d).select(col("doc_id"))
      .withColumn("b",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 10)
      .select(col("doc_id"),
        when(col("b") < 8, "train").when(col("b") === 8, "validation")
          .otherwise("test").as("n_split"))
    // ONE split map carrying both policies (each assigns every doc
    // exactly one split, so the join is 1:1): the two audits used to
    // run as separate passes — two gram-stream joins, two train-gram
    // DISTINCTs, two test⋈trainGrams joins — over the widest frame in
    // the query (~0.9 M exploded grams at sf0.1). Fused, the stream is
    // joined once, the per-gram train flags for BOTH policies come
    // from one partial-aggable groupBy(s0), and the leak counts reduce
    // per doc then to one row — half the wide exchanges for
    // byte-identical output (guide §2: shuffle fewer bytes, fewer
    // times).
    val splits = atomic.join(naive, Seq("doc_id"))
    // no (doc_id, s0) distinct: graft_shingles5 returns a per-doc
    // DISTINCT set already (ShingleSet's LinkedHashSet — the oracle's
    // list_distinct is likewise per-doc only), so the global distinct
    // was a full extra exchange+aggregate of the widest stream in the
    // query for rows that cannot repeat (xxhash64-collision caveat =
    // d02's accepted analysis)
    val g = Tables.documents(s, d)
      .select(col("doc_id"), explode(expr("graft_shingles5(text)")).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("s0"))
      .join(splits, "doc_id")
      .cache()
    registerRelease(() => { g.unpersist(); () })
    // per-gram flags: does this hash occur in either policy's train set
    val flags = g.groupBy(col("s0")).agg(
      max(col("a_split") === "train").as("a_train"),
      max(col("n_split") === "train").as("n_train"))
    // per-doc leak tallies over test docs of either policy (a doc
    // outside both test sets contributes to neither audit)
    val perDoc = g.filter(col("a_split") === "test" || col("n_split") === "test")
      .join(flags, "s0")
      .groupBy(col("doc_id"), col("a_split"), col("n_split"))
      .agg(sum(when(col("a_train"), 1L).otherwise(0L)).as("a_hits"),
        sum(when(col("n_train"), 1L).otherwise(0L)).as("n_hits"))
    val one = perDoc.agg(
      count(when(col("a_split") === "test", lit(1))).as("a_docs"),
      count(when(col("a_split") === "test" && col("a_hits") > 0, lit(1)))
        .as("a_contam"),
      coalesce(sum(when(col("a_split") === "test", col("a_hits"))), lit(0L))
        .as("a_leaked"),
      count(when(col("n_split") === "test", lit(1))).as("nv_docs"),
      count(when(col("n_split") === "test" && col("n_hits") > 0, lit(1)))
        .as("nv_contam"),
      coalesce(sum(when(col("n_split") === "test", col("n_hits"))), lit(0L))
        .as("nv_leaked"))
    // both output rows off the ONE aggregated row (a union of two
    // projections would re-run the whole aggregate per branch)
    one.select(explode(array(
        struct(lit("cluster_atomic").as("mode"), col("a_docs").as("n_test_docs"),
          col("a_contam").as("n_contaminated"),
          col("a_leaked").as("n_leaked_grams")),
        struct(lit("naive_per_doc").as("mode"), col("nv_docs").as("n_test_docs"),
          col("nv_contam").as("n_contaminated"),
          col("nv_leaked").as("n_leaked_grams")))).as("r"))
      .select(col("r.mode").as("mode"), col("r.n_test_docs").as("n_test_docs"),
        col("r.n_contaminated").as("n_contaminated"),
        col("r.n_leaked_grams").as("n_leaked_grams"))
  }

  /** Calibration board for the trained gate — the reliability curve
    * an ML-ops deployment monitors: scores bucketed into deciles,
    * each bucket reporting exact member count, exact positive count,
    * and the exact integer sum of per-doc pinned scores (avg = sum/n
    * is then derivable without any order-dependent float aggregate).
    * On this no-signal corpus the model converges to the class prior,
    * so scores concentrate in one or two deciles whose observed
    * positive rate ≈ the predicted score — the well-calibrated
    * outcome for a prior-fitted model, replayed as exact integers.
    * Same pure-map scoring plan as e06 plus one partial-agg shuffle
    * over ≤ 10 groups.
    */
  def e07LrCalibration(s: SparkSession, d: String): DataFrame = {
    lrScored(s, d)
      .select(least(floor(col("p") * lit(10.0)), lit(9L)).cast("long").as("decile"),
        col("y"),
        round(col("p") * lit(1e6)).cast("long").as("ps"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("y").cast("long")).as("n_pos"),
        sum(col("ps")).as("sum_p_scaled"))
  }

  /** p09: canonical-copy selection — the production "which duplicate
    * do we KEEP" decision, composed from two existing gates: d07's
    * dup clusters pick WHO is duplicated, e06's learned quality score
    * picks WHICH copy survives (argmax p_scaled per cluster, doc_id
    * tie-break) — replacing d07's arbitrary min-id canonical with the
    * best copy, which is what a training-data pipeline actually ships.
    * All-integer output (p_scaled is e06's 1e6-scaled score), so the
    * composition is hash-exact end to end.
    *
    * Scale shape: clusters come from the banded candidate graph (no
    * new pair join), scores from a pure map; the join is
    * cluster-member-sized (dup docs only, ≪ corpus) and the argmax is
    * one rank window over cluster_id — nothing here rescans the
    * corpus beyond what d07 and e06 already pay.
    */
  def p09CanonicalKeep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = graft.queries.Dedup.d07DupClusters(s, d)
      .select(col("doc_id"), col("cluster_id"))
    val scores = e06LrQualityScore(s, d).select(col("doc_id"), col("p_scaled"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("p_scaled").desc, col("doc_id"))
    clusters.join(scores, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(max(when(col("rk") === 1, col("doc_id"))).as("keep_id"),
        max(when(col("rk") === 1, col("p_scaled"))).as("keep_p_scaled"),
        count(lit(1)).as("n_members"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e10_split_contamination" -> e10SplitContamination,
    "e08_negative_sampling" -> e08NegativeSampling,
    "e07_lr_calibration" -> e07LrCalibration,
    "p08_weighted_sample" -> p08WeightedSample,
    "p09_canonical_keep" -> p09CanonicalKeep,
    "e06_lr_quality_score" -> e06LrQualityScore,
    "e05_lr_quality_train" -> e05LrQualityTrain,
    "p07_zorder_layout" -> p07ZorderLayout,
    "p06_shard_manifest" -> p06ShardManifest,
    "e03_distribution_drift" -> e03DistributionDrift,
    "e02_knn_outliers" -> e02KnnOutliers,
    "e04_knn_outliers_ann" -> e04KnnOutliersAnn,
    "p05_temperature_mix" -> p05TemperatureMix,
    "p04_leak_safe_split" -> p04LeakSafeSplit,
    "p03_mix_to_budget" -> p03MixToBudget,
    "p02_semdedup" -> p02SemDedup,
    "p01_corpus_build" -> p01CorpusBuild,
    "t06_quality_filter" -> t06QualityFilter,
    "t07_freq_spectrum" -> t07FreqSpectrum,
    "e01_cluster_stats" -> e01ClusterStats,
    "q37_hash_sample" -> q37HashSample)

  private val semdedupSql =
    """WITH RECURSIVE
       e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       jp AS (
         SELECT a.vec_id AS va, b.vec_id AS vb
         FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> a.v[i] * b.v[i])), (acc, x) -> acc + x)
           / (sqrt(list_reduce(list_prepend(0.0, list_transform(a.v, x -> x * x)), (acc, x) -> acc + x))
            * sqrt(list_reduce(list_prepend(0.0, list_transform(b.v, x -> x * x)), (acc, x) -> acc + x))) >= 0.35),
       edges AS (SELECT va AS src, vb AS dst FROM jp
                 UNION SELECT vb, va FROM jp),
       reach(src, dst) AS (
         SELECT src, dst FROM edges
         UNION
         SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
       lab AS (
         SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
         FROM reach GROUP BY src)
       SELECT vec_id, label FROM embeddings
       WHERE vec_id NOT IN (SELECT vec_id FROM lab WHERE vec_id <> cluster_id)"""

  /** THE PSI oracle — one definition shared by e03 (batch) and
    * st19 (streaming), which answer to the same converged marginals
    * by design; a single val so the two gates cannot silently drift
    * apart on a future edit.
    */
  val psiOracleSql: String =
    """WITH counts AS (
         SELECT lang,
           sum(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 2 = 0
                    THEN 1 ELSE 0 END)::BIGINT AS n_a,
           sum(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 2 = 1
                    THEN 1 ELSE 0 END)::BIGINT AS n_b
         FROM documents GROUP BY 1),
       tot AS (SELECT sum(n_a)::BIGINT AS ta, sum(n_b)::BIGINT AS tb FROM counts),
       terms AS (
         SELECT lang, n_a, n_b,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             round((n_a / (ta * 1.0) - n_b / (tb * 1.0))
               * ln((n_a / (ta * 1.0)) / (n_b / (tb * 1.0))) * 1e9)::BIGINT
           END AS psi_scaled
         FROM counts, tot)
       SELECT lang, n_a, n_b, psi_scaled FROM terms
       UNION ALL
       SELECT '_total', sum(n_a)::BIGINT, sum(n_b)::BIGINT,
         sum(psi_scaled)::BIGINT FROM terms"""

  /** THE LR training replay — e05's three GD iterations as chained
    * 1-row CTEs, shared verbatim by e05 (trajectory) and e06
    * (inference under the final weights) so the two oracles cannot
    * drift apart. Per-doc gradient/loss terms pin to scaled BIGINTs
    * before the sum (order-free); weight updates are exact integer
    * arithmetic.
    */
  private val lrTrainCtes: String = {
    // one iteration's aggregate over f given the entering weights
    // (join = the previous update CTE carrying them, aliased u)
    def it(w0: String, w1: String, w2: String, w3: String, join: String) =
      s"""SELECT sum(round((p - y) * 1.0 * 1e6))::BIGINT AS s0,
            sum(round((p - y) * x1 * 1e6))::BIGINT AS s1,
            sum(round((p - y) * x2 * 1e6))::BIGINT AS s2,
            sum(round((p - y) * x3 * 1e6))::BIGINT AS s3,
            sum(round(-(y * ln(p) + (1.0 - y) * ln(1.0 - p)) * 1e6))::BIGINT AS sl,
            count(*)::BIGINT AS n
          FROM (SELECT y, x1, x2, x3,
            1.0 / (1.0 + exp(-(($w0) / 1e6 + ($w1) / 1e6 * x1 + ($w2) / 1e6 * x2 + ($w3) / 1e6 * x3))) AS p
            FROM f$join)"""
    def upd(prev0: String, prev1: String, prev2: String, prev3: String, iter: String, join: String) =
      s"""SELECT ($prev0 - round(0.5 * s0::DOUBLE / n))::BIGINT AS w0,
                 ($prev1 - round(0.5 * s1::DOUBLE / n))::BIGINT AS w1,
                 ($prev2 - round(0.5 * s2::DOUBLE / n))::BIGINT AS w2,
                 ($prev3 - round(0.5 * s3::DOUBLE / n))::BIGINT AS w3,
                 $iter.sl AS sl FROM $iter$join"""
    s"""f AS (
         SELECT doc_id,
           CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END::DOUBLE AS y,
           n_chars::DOUBLE / 1000.0 AS x1,
           len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> ''))::DOUBLE / 100.0 AS x2,
           len(list_intersect(list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')),
             ['the', 'a', 'and', 'of', 'to']))::DOUBLE / 10.0 AS x3
         FROM documents),
       i1 AS (${it("0", "0", "0", "0", "")}),
       u1 AS (${upd("0", "0", "0", "0", "i1", "")}),
       i2 AS (${it("u.w0", "u.w1", "u.w2", "u.w3", ", u1 u")}),
       u2 AS (${upd("u.w0", "u.w1", "u.w2", "u.w3", "i2", ", u1 u")}),
       i3 AS (${it("u.w0", "u.w1", "u.w2", "u.w3", ", u2 u")}),
       u3 AS (${upd("u.w0", "u.w1", "u.w2", "u.w3", "i3", ", u2 u")})"""
  }

  /** The scored-documents subquery under the final weights — shared
    * by the e06 and e07 oracles (one copy, like lrTrainCtes).
    */
  private val lrScoredSql: String =
    """SELECT doc_id, y,
         1.0 / (1.0 + exp(-((u.w0) / 1e6 + (u.w1) / 1e6 * x1 + (u.w2) / 1e6 * x2 + (u.w3) / 1e6 * x3))) AS p
       FROM f, u3 u"""

  // ONE string for the cluster-atomic split SQL — shared by the p04
  // oracle and e10's audit so the two cannot drift (the rpCte/ivfTopK
  // single-source discipline)
  private val p04SplitSql: String =
    s"""WITH RECURSIVE
          ${graft.queries.Dedup.clusterCtes},
          labels AS (
            SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
            FROM reach GROUP BY src),
          grp AS (
            SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS group_id
            FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
          SELECT doc_id, group_id,
            CASE WHEN b < 8 THEN 'train'
                 WHEN b = 8 THEN 'validation'
                 ELSE 'test' END AS split
          FROM (SELECT doc_id, group_id,
                  ('0x' || substr(md5(group_id::VARCHAR), 1, 8))::BIGINT % 10 AS b
                FROM grp) t"""

  val oracles: Map[String, String] = Map(
    // both split policies replayed (p04's cluster CTE + the naive
    // hash), the same per-doc-distinct 5-gram stream, the same counts
    "e10_split_contamination" -> s"""
      WITH atomic AS (SELECT doc_id, split FROM ($p04SplitSql)),
        naive AS (
          SELECT doc_id, CASE WHEN b < 8 THEN 'train'
                              WHEN b = 8 THEN 'validation'
                              ELSE 'test' END AS split
          FROM (SELECT doc_id,
                  ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10 AS b
                FROM documents) t),
        e10toks AS (
          SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS t
          FROM documents),
        e10g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 3),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS g5
          FROM e10toks),
        audit AS (
          SELECT 'cluster_atomic' AS mode, split, doc_id, g5
          FROM e10g JOIN atomic USING (doc_id)
          UNION ALL
          SELECT 'naive_per_doc', split, doc_id, g5
          FROM e10g JOIN naive USING (doc_id)),
        tr AS (SELECT DISTINCT mode, g5 FROM audit WHERE split = 'train'),
        te AS (SELECT mode, doc_id, g5 FROM audit WHERE split = 'test'),
        leak AS (
          SELECT te.mode, count(DISTINCT te.doc_id) AS n_contaminated,
            count(*) AS n_leaked_grams
          FROM te JOIN tr ON tr.mode = te.mode AND tr.g5 = te.g5
          GROUP BY 1),
        td AS (SELECT mode, count(DISTINCT doc_id) AS n_test_docs
               FROM te GROUP BY 1),
        modes AS (SELECT unnest(['cluster_atomic', 'naive_per_doc']) AS mode)
      SELECT m.mode, coalesce(td.n_test_docs, 0)::BIGINT AS n_test_docs,
        coalesce(leak.n_contaminated, 0)::BIGINT AS n_contaminated,
        coalesce(leak.n_leaked_grams, 0)::BIGINT AS n_leaked_grams
      FROM modes m
      LEFT JOIN td ON td.mode = m.mode
      LEFT JOIN leak ON leak.mode = m.mode""",
    // identical md5 draws, existence check, cluster exclusion (d07's
    // own recursive-CTE labels), and (j, cand_id) ranking
    "e08_negative_sampling" -> s"""
      WITH labels AS (SELECT doc_id, cluster_id
                      FROM (${graft.queries.Dedup.oracles("d07_dup_clusters")})),
        nn AS (SELECT count(*)::BIGINT AS n FROM documents),
        ranked AS (SELECT doc_id AS cand_id,
                     (row_number() OVER (ORDER BY doc_id) - 1)::BIGINT AS rk
                   FROM documents),
        anchors AS (SELECT doc_id AS anchor_id FROM documents
                    WHERE doc_id % 50 = 0),
        cand0 AS (
          SELECT anchor_id, j,
            ('0x' || substr(md5(anchor_id::VARCHAR || '_' || j::VARCHAR),
                 1, 12))::BIGINT % n AS rk
          FROM anchors, range(1, 9) r(j), nn),
        cand1 AS (
          SELECT c.anchor_id, c.j, rr.cand_id FROM cand0 c
          JOIN ranked rr ON rr.rk = c.rk
          WHERE rr.cand_id <> c.anchor_id),
        cand2 AS (
          SELECT c.* FROM cand1 c
          LEFT JOIN labels la ON la.doc_id = c.anchor_id
          LEFT JOIN labels lb ON lb.doc_id = c.cand_id
          WHERE la.cluster_id IS NULL OR lb.cluster_id IS NULL
             OR la.cluster_id <> lb.cluster_id),
        cand3 AS (SELECT anchor_id, cand_id, min(j) AS j
                  FROM cand2 GROUP BY 1, 2)
      SELECT anchor_id,
        row_number() OVER (PARTITION BY anchor_id ORDER BY j, cand_id)
          ::BIGINT AS neg_rank,
        cand_id AS neg_id
      FROM cand3 QUALIFY neg_rank <= 3""",
    // same weight derivation, same decile bucketing, exact integer
    // aggregates only (n, positives, pinned score sums)
    "e07_lr_calibration" ->
      s"""WITH $lrTrainCtes
         SELECT least(floor(p * 10.0), 9)::BIGINT AS decile,
           count(*)::BIGINT AS n_docs,
           sum(y)::BIGINT AS n_pos,
           sum(round(p * 1e6))::BIGINT AS sum_p_scaled
         FROM ($lrScoredSql)
         GROUP BY 1""",
    // same md5 uniform, same pinned log-form A-ES key, same tie-break
    "p08_weighted_sample" ->
      """SELECT doc_id, lang, n_chars,
           round(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT + 1.0)
             / 16777217.0) / n_chars::DOUBLE * 1e9)::BIGINT AS key_scaled
         FROM documents WHERE n_chars > 0
         ORDER BY key_scaled DESC, doc_id LIMIT 100""",
    "e05_lr_quality_train" ->
      s"""WITH $lrTrainCtes
         SELECT 1 AS iter, w0, w1, w2, w3, sl AS loss_scaled FROM u1
         UNION ALL SELECT 2, w0, w1, w2, w3, sl FROM u2
         UNION ALL SELECT 3, w0, w1, w2, w3, sl FROM u3""",
    // identical weight derivation, then one scoring SELECT — the same
    // literal-weights map the engine runs
    "e06_lr_quality_score" ->
      s"""WITH $lrTrainCtes
         SELECT doc_id, round(p * 1e6)::BIGINT AS p_scaled,
           p >= 0.5 AS pred_en, y = 1.0 AS is_en
         FROM ($lrScoredSql)""",
    // p09: d07's cluster oracle nested as a subquery (its own WITH
    // included — DuckDB scopes it locally) joined with e06's scored
    // CTE chain; the argmax is the same rank-then-aggregate both
    // engines run, over all-integer values
    "p09_canonical_keep" ->
      s"""WITH $lrTrainCtes,
          sc AS (SELECT doc_id, round(p * 1e6)::BIGINT AS p_scaled
                 FROM ($lrScoredSql)),
          j AS (SELECT c.cluster_id, c.doc_id, sc.p_scaled
                FROM (${graft.queries.Dedup.oracles("d07_dup_clusters")}) c
                JOIN sc USING (doc_id)),
          r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
                  ORDER BY p_scaled DESC, doc_id) AS rk FROM j)
          SELECT cluster_id,
            max(CASE WHEN rk = 1 THEN doc_id END) AS keep_id,
            max(CASE WHEN rk = 1 THEN p_scaled END) AS keep_p_scaled,
            count(*)::BIGINT AS n_members
          FROM r GROUP BY 1""",
    // identical grid normalization, bit interleave, and 64-way z-range
    // cut — all integer / exactly-representable double arithmetic
    "p07_zorder_layout" ->
      """WITH src AS (
           SELECT date_diff('day', DATE '1970-01-01', l_shipdate::DATE)::BIGINT AS d1,
                  l_partkey AS d2
           FROM lineitem),
         b AS (SELECT min(d1) AS lo1, max(d1) AS hi1,
                      min(d2) AS lo2, max(d2) AS hi2 FROM src),
         g AS (
           SELECT CAST(floor(((d1 - lo1) * 256)::DOUBLE / ((hi1 - lo1 + 1))::DOUBLE) AS BIGINT) AS b1,
                  CAST(floor(((d2 - lo2) * 256)::DOUBLE / ((hi2 - lo2 + 1))::DOUBLE) AS BIGINT) AS b2
           FROM src, b),
         z AS (
           SELECT b1, b2,
             (((b1 >> 0) & 1) << 1) + (((b2 >> 0) & 1) << 0)
           + (((b1 >> 1) & 1) << 3) + (((b2 >> 1) & 1) << 2)
           + (((b1 >> 2) & 1) << 5) + (((b2 >> 2) & 1) << 4)
           + (((b1 >> 3) & 1) << 7) + (((b2 >> 3) & 1) << 6)
           + (((b1 >> 4) & 1) << 9) + (((b2 >> 4) & 1) << 8)
           + (((b1 >> 5) & 1) << 11) + (((b2 >> 5) & 1) << 10)
           + (((b1 >> 6) & 1) << 13) + (((b2 >> 6) & 1) << 12)
           + (((b1 >> 7) & 1) << 15) + (((b2 >> 7) & 1) << 14) AS zv
           FROM g)
         SELECT CAST(floor(zv::DOUBLE / 1024.0) AS BIGINT) AS zbucket,
           count(*)::BIGINT AS n_rows,
           min(b1) AS b1_lo, max(b1) AS b1_hi,
           min(b2) AS b2_lo, max(b2) AS b2_hi
         FROM z GROUP BY 1""",
    // the same size-desc round-robin deal, via the direct window the
    // distributed two-level ranking must equal
    "p06_shard_manifest" ->
      """WITH r AS (
           SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS rk
           FROM documents)
         SELECT rk % 16 AS shard, count(*) AS n_docs,
           sum(n_chars)::BIGINT AS total_chars
         FROM r GROUP BY 1""",
    // same hash split, same conditional-count pass, same integer-pinned
    // PSI terms; the _total row's exact integer sum must match too
    "e03_distribution_drift" -> psiOracleSql,
    // e04 answers to the SAME exact oracle as e02 — the NN-descent
    // tier's contract is convergence to the exact 3-NN on this corpus
    "e04_knn_outliers_ann" ->
      """WITH e AS (
           SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_reduce(list_prepend(0.0, list_transform(embedding::DOUBLE[], x -> x * x)), (a, x) -> a + x)) AS nrm
           FROM embeddings),
         pc AS (
           SELECT a.vec_id, a.label, b.vec_id AS nb,
             list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> a.v[i] * b.v[i])), (ac, x) -> ac + x)
               / (a.nrm * b.nrm) AS cos
           FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn3 AS (
           SELECT vec_id, label, cos AS knn3_cos FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY cos DESC, nb) AS rk FROM pc) WHERE rk = 3)
         SELECT vec_id, label, knn3_cos,
           row_number() OVER (PARTITION BY label ORDER BY knn3_cos, vec_id)::BIGINT
             AS sparsity_rank,
           row_number() OVER (PARTITION BY label ORDER BY knn3_cos, vec_id) <= 5
             AS is_outlier
         FROM knn3""",
    "e02_knn_outliers" ->
      """WITH e AS (
           SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_reduce(list_prepend(0.0, list_transform(embedding::DOUBLE[], x -> x * x)), (a, x) -> a + x)) AS nrm
           FROM embeddings),
         pc AS (
           SELECT a.vec_id, a.label, b.vec_id AS nb,
             list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> a.v[i] * b.v[i])), (ac, x) -> ac + x)
               / (a.nrm * b.nrm) AS cos
           FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn3 AS (
           SELECT vec_id, label, cos AS knn3_cos FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY cos DESC, nb) AS rk FROM pc) WHERE rk = 3)
         SELECT vec_id, label, knn3_cos,
           row_number() OVER (PARTITION BY label ORDER BY knn3_cos, vec_id)::BIGINT
             AS sparsity_rank,
           row_number() OVER (PARTITION BY label ORDER BY knn3_cos, vec_id) <= 5
             AS is_outlier
         FROM knn3""",
    "p05_temperature_mix" ->
      """WITH stats AS (
           SELECT source, count(*)::BIGINT AS n_docs,
             CAST(round(sqrt(count(*)::DOUBLE) * 1000000) AS BIGINT) AS w
           FROM documents GROUP BY 1),
         tot AS (SELECT sum(w)::BIGINT AS sw FROM stats),
         quotas AS (
           SELECT source, (300 * w) // sw AS quota
           FROM stats CROSS JOIN tot),
         ranked AS (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT,
                        doc_id)::BIGINT AS "rank"
           FROM documents)
         SELECT r.source, doc_id, "rank", quota::BIGINT AS quota
         FROM ranked r JOIN quotas q ON r.source = q.source
         WHERE "rank" <= quota""",
    "p04_leak_safe_split" -> p04SplitSql,
    "p03_mix_to_budget" ->
      """WITH ranked AS (
           SELECT source, doc_id, n_chars,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h,
             3000 * (1 + ascii(substr(source, -1, 1)) % 3) AS budget
           FROM documents),
         filled AS (
           SELECT source, budget, n_chars,
             sum(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM ranked)
         SELECT source, count(*) AS n_docs,
           CAST(max(cum) AS BIGINT) AS chars_used,
           CAST(budget AS BIGINT) AS char_budget
         FROM filled WHERE cum <= budget
         GROUP BY source, budget""",
    "p02_semdedup" -> semdedupSql,
    "p01_corpus_build" ->
      s"""WITH RECURSIVE
          ${graft.queries.Dedup.clusterCtes},
          clusters AS (
            SELECT src AS doc_id,
              src = least(src, min(dst)) AS is_canonical
            FROM reach GROUP BY src),
          losers AS (SELECT doc_id FROM clusters WHERE NOT is_canonical),
          quality AS (
            SELECT doc_id FROM (
              SELECT doc_id, n_chars, len(toks) AS n_tokens,
                len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE AS uniq_ratio
              FROM (SELECT doc_id, n_chars,
                      list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
                    FROM documents) t0) t1
            WHERE n_chars >= 100 AND n_tokens >= 20 AND uniq_ratio >= 0.3),
          kept AS (
            SELECT doc_id FROM quality
            WHERE doc_id NOT IN (SELECT doc_id FROM losers))
          SELECT doc_id, lang, rk FROM (
            SELECT k.doc_id, d.lang,
              row_number() OVER (PARTITION BY d.lang ORDER BY
                ('0x' || substr(md5(k.doc_id::VARCHAR), 1, 8))::BIGINT,
                k.doc_id) AS rk
            FROM kept k JOIN documents d ON k.doc_id = d.doc_id) ranked
          WHERE rk <= 50""",
    "t06_quality_filter" ->
      """WITH scored AS (
           SELECT doc_id, n_chars,
             len(toks) AS n_tokens,
             len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE AS uniq_ratio
           FROM (SELECT doc_id, n_chars,
                   list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
                 FROM documents))
         SELECT doc_id, n_chars, n_tokens, uniq_ratio,
           CASE WHEN n_chars < 100 THEN 'too_short'
                WHEN n_tokens < 20 THEN 'too_few_tokens'
                WHEN uniq_ratio < 0.3 THEN 'too_repetitive'
                ELSE NULL END AS drop_reason,
           (CASE WHEN n_chars < 100 THEN 'too_short'
                 WHEN n_tokens < 20 THEN 'too_few_tokens'
                 WHEN uniq_ratio < 0.3 THEN 'too_repetitive'
                 ELSE NULL END) IS NULL AS keep
         FROM scored""",
    "t07_freq_spectrum" ->
      """SELECT k, count(*) AS n_words FROM (
           SELECT word, count(*) AS k FROM (
             SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS word
             FROM documents) t GROUP BY 1) c
         GROUP BY 1""",
    "e01_cluster_stats" ->
      """WITH ev AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         cent AS (
           SELECT label, list(dim_sum / n ORDER BY k) AS cv FROM (
             SELECT label, k,
               list_reduce(list_prepend(0.0,
                 list_transform(vs, vv -> vv[k])), (a, x) -> a + x) AS dim_sum,
               n
             FROM (SELECT label, list(v ORDER BY vec_id) AS vs, count(*) AS n
                   FROM ev GROUP BY label),
                  unnest(range(1, 65)) AS u(k)) dims
           GROUP BY label),
         d2 AS (
           SELECT e.label,
             list_reduce(list_prepend(0.0,
               list_transform(range(1, 65), i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))),
               (a, x) -> a + x) AS dist2
           FROM ev e JOIN cent c ON e.label = c.label)
         SELECT label, count(*) AS n, round(sum(dist2), 4) AS inertia
         FROM d2 GROUP BY 1""",
    "q37_hash_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % 10 = 0""")
}
