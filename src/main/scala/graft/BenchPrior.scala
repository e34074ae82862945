package graft

/** Pure prior-selection and regression-flag logic for [[Bench]],
  * extracted into a directly-testable unit (VERDICT r14 item 3): the
  * inline version produced two consecutive rounds of silent
  * flag-coverage loss — r13's driver runs diffed against a slowest-20
  * artifact, and r14's local sweeps diffed against the round's OWN
  * committed artifact once it existed (both r14 "zero-flag healthy
  * windows" recorded `flags_prior = BENCH_r14_local.json`, i.e.
  * themselves; against the true r13 prior they carried 16 and 1
  * flags). This logic decides what the whole perf discipline can see,
  * so every rule here is spec-pinned in BenchPriorSpec, with the
  * mutations that reproduce both historical failures asserted red.
  *
  * Nothing here touches the filesystem: callers pass file NAMES (a
  * directory listing) and a `readText` thunk, so the spec drives every
  * branch with in-memory fixtures.
  */
object BenchPrior {

  /** `BENCH_r{N}.json` — the driver-harness artifact series, one per
    * round, committed at round end. This series is the repo's ROUND
    * CLOCK: during round N the newest committed driver artifact is
    * N-1 (locals can run ahead mid-round; driver artifacts cannot). */
  private val DriverArtifact = "BENCH_r(\\d+)\\.json".r

  /** `BENCH_r{N}_local.json` — the repo-local sweep series
    * (tools/bench_local.sh), promoted by hand once per round. */
  private val LocalArtifact = "BENCH_r(\\d+)_local\\.json".r

  /** `BENCH_full_driver_r{N}_{sf}.json` — the full-precision 207-query
    * sidecar a driver-kind run persists (the official BENCH_r*.json
    * "parsed" carries only the slowest 20 — VERDICT r13 item 4).
    * Round-keyed since r15 (ADVICE r14): a stray same-sf manual run or
    * a re-run within a round overwrites only its OWN round's file, so
    * the prior stays round-over-round instead of silently becoming
    * intra-round. */
  private val Sidecar = "BENCH_full_driver_r(\\d+)_(.+)\\.json".r

  /** Canonical scale-factor identity: the basename ("sf0.1"), so
    * relative/absolute/trailing-slash spellings of the same sf dir
    * compare equal (ADVICE r14 — an exact-string compare parsed the
    * sidecar to 0 queries on a respelled path and silently dropped
    * flag coverage to zero). */
  def canonicalSf(s: String): String = {
    val t = s.replace('\\', '/').reverse.dropWhile(_ == '/').reverse
    t.substring(t.lastIndexOf('/') + 1)
  }

  /** The round currently being built: one past the newest committed
    * driver artifact. No driver artifacts → round 1 (no prior exists
    * either way). */
  def currentRound(fileNames: Seq[String]): Int =
    fileNames.collect { case DriverArtifact(n) => n.toInt }
      .maxOption.getOrElse(0) + 1

  /** The round clock CANDIDATE SELECTION runs on. Driver kind:
    * [[currentRound]] unchanged. Local kind: when the checkout has no
    * driver artifact series at all (ADVICE r15 — e.g. a scratch dir
    * holding only promoted local sweeps), [[currentRound]] pins at 1
    * and the strictly-below filter would exclude EVERY local prior
    * forever, including a genuine earlier round's; the local series'
    * own max round then becomes the clock, so the NEWEST local is
    * conservatively treated as this round's own (it becomes the
    * intra-round prior via [[intraRoundPrior]], never the cross-round
    * one — without a driver clock there is no way to prove it is not
    * self) and every earlier local qualifies as a cross-round prior. */
  private def clock(kind: String, fileNames: Seq[String]): Int = {
    val cur = currentRound(fileNames)
    if (kind == "local" && cur == 1)
      fileNames.collect { case LocalArtifact(n) => n.toInt }
        .maxOption.getOrElse(cur)
    else cur
  }

  /** Prior-artifact candidates for the cross-round flags, best first.
    *
    * SELF-PRIOR EXCLUSION (the r14 defect): only rounds STRICTLY BELOW
    * [[currentRound]] qualify. Once a round's own artifact is
    * committed mid-round, a bare newest-first pick resolves the prior
    * to the file the run promotes into, and regressions vs last round
    * go unflagged — exactly what happened to both r14 local windows.
    *
    * Kind routing (VERDICT r12 item 2): local sweeps diff only against
    * the local series; driver runs order candidates by ROUND first
    * (newest prior round wins), preferring the round-keyed full-map
    * sidecar over the slowest-20 artifact WITHIN a round — so a
    * missing round-16 sidecar degrades to BENCH_r16.json's slowest
    * 20, never silently to a three-round-stale r14 sidecar (an
    * independent-review finding on the first r15 cut, which ranked
    * all sidecars ahead of all artifacts). The r14-era UNKEYED
    * sidecar name is deliberately NOT read: it carries no round, so
    * a stale pre-r15 binary could write the current round's own map
    * into it and re-open the self-prior hole through that slot; the
    * repo's one legacy file is renamed into the keyed series. A
    * cross-kind diff is environment noise, never a fallback. Bench
    * feeds the GROUPED form ([[priorPool]]) to [[resolvePriorPool]],
    * which walks each round's group until a candidate yields a
    * non-empty sf-matching map — so a corrupt or sf-mismatched
    * sidecar degrades to the next candidate within its round instead
    * of to zero coverage (ADVICE r14); this flattened form is the
    * same candidates in the same order.
    *
    * Fresh-dir fallback: a working dir with NO committed driver
    * artifacts has no round clock (currentRound is always 1), so the
    * strictly-below filter would exclude even the previous run's own
    * sidecar forever — strictly worse than the pre-r15 unkeyed flow.
    * Only when the filtered candidate list is empty, the current
    * round's sidecar (necessarily a PREVIOUS run's: each run reads
    * before it writes) is offered as the last resort; with any
    * artifact series present the normal rules apply unchanged. */
  def priorCandidates(kind: String, fileNames: Seq[String],
      sfName: String): Seq[String] =
    priorPool(kind, fileNames, sfName, k = Int.MaxValue).flatten

  /** Prior candidates GROUPED BY PRIOR ROUND, newest round first, up
    * to `k` rounds — each inner list ordered best-first within its
    * round (same ranking as [[priorCandidates]], which is exactly
    * this pool flattened). This is the input shape the weather
    * defense ([[resolvePriorPool]]) needs: one resolved map per prior
    * round, merged per-query. The fresh-dir fallback (driver kind,
    * no round clock) contributes a single group. */
  def priorPool(kind: String, fileNames: Seq[String], sfName: String,
      k: Int = 3): Seq[Seq[String]] = {
    val cur = clock(kind, fileNames)
    val grouped: Seq[Seq[String]] =
      if (kind == "local")
        fileNames.collect { case f @ LocalArtifact(n) => (n.toInt, f) }
          .filter(_._1 < cur).sortBy(-_._1).map(t => Seq(t._2))
      else {
        // rank within a round: sidecar (full map) before artifact
        val ranked =
          fileNames.collect {
            case f @ Sidecar(n, sf) if sf == sfName => (n.toInt, 0, f)
          } ++
          fileNames.collect { case f @ DriverArtifact(n) => (n.toInt, 1, f) }
        val prior = ranked.filter(_._1 < cur)
        if (prior.nonEmpty)
          prior.groupBy(_._1).toSeq.sortBy(-_._1)
            .map(_._2.sortBy(_._2).map(_._3))
        else {
          val fallback = ranked.collect { case (n, 0, f) if n == cur => f }
          if (fallback.isEmpty) Nil else Seq(fallback)
        }
      }
    grouped.take(k)
  }

  /** The current round's own already-persisted artifact, if any — the
    * optional SECOND prior (VERDICT r14 item 5, extended to driver
    * kind per VERDICT r15 item 5): diffing against the round's own
    * earlier window catches intra-round regressions the cross-round
    * prior dilutes, and — because both sides are the same tree — any
    * flag it raises is environment BY CONSTRUCTION, the cheapest
    * weather attribution there is. Local kind: the round's promoted
    * BENCH_r{cur}_local.json. Driver kind: the round's own sidecar
    * (each run reads before it writes, so the file present at read
    * time is a PREVIOUS run of this round). Reported as a separate
    * flag set (`flags_intra`), never mixed into the cross-round
    * series' flags; callers must skip it when it is already serving
    * as the cross-round prior (the fresh-dir fallback). */
  def intraRoundPrior(kind: String, fileNames: Seq[String],
      sfName: String): Option[String] = {
    val cur = clock(kind, fileNames)
    if (kind == "local")
      fileNames.collectFirst {
        case f @ LocalArtifact(n) if n.toInt == cur => f
      }
    else
      fileNames.collectFirst {
        case f @ Sidecar(n, sf) if n.toInt == cur && sf == sfName => f
      }
  }

  /** Parse a prior artifact's text into its query→seconds map.
    * Covers both artifact shapes: raw stdout sweeps carry one JSON per
    * line (full-precision line + compact slowest-20 line — the biggest
    * map wins); the driver's artifact is ONE pretty-printed object
    * whose query map sits under "parsed". Only sf-matching nodes
    * qualify — by canonical identity ([[canonicalSf]]), so an absolute
    * sfDir matches a sidecar that recorded a relative spelling of the
    * same scale factor, while a genuinely different sf (a sf0.01 dev
    * sweep vs the sf0.1 series) still filters out. */
  def parsePriorQueries(text: String, sfDir: String): Map[String, Double] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val want = canonicalSf(sfDir)
    val lineNodes = text.linesIterator.map(_.trim)
      .filter(_.startsWith("{"))
      .flatMap(l => scala.util.Try(om.readTree(l)).toOption)
      .toList
    val wholeNodes = scala.util.Try(om.readTree(text)).toOption
      .toList.flatMap(n => n :: Option(n.get("parsed")).toList)
    val best = (lineNodes ++ wholeNodes)
      .filter(n => n.has("queries") && n.get("queries").isObject &&
        (!n.has("sf") || canonicalSf(n.get("sf").asText()) == want))
      .sortBy(-_.get("queries").size()).headOption
    best.map { node =>
      import scala.jdk.CollectionConverters._
      node.get("queries").properties().asScala
        .map(e => e.getKey -> e.getValue.asDouble()).toMap
    }.getOrElse(Map.empty[String, Double])
  }

  /** Walk the candidate list (paths, best first) and return the first
    * that parses to a NON-EMPTY sf-matching query map, with (path,
    * map); corrupt or empty candidates degrade to the next with a loud
    * note instead of silently zeroing flag coverage (ADVICE r14 — the
    * pre-r15 code took exactly one candidate and ate its failure).
    * All-bad → ("", empty): no prior, no flags, stated. */
  def resolvePrior(candidates: Seq[String], sfDir: String,
      readText: String => String,
      note: String => Unit = _ => ()): (String, Map[String, Double]) =
    candidates.iterator.map { p =>
      val m =
        try {
          val parsed = parsePriorQueries(readText(p), sfDir)
          if (parsed.isEmpty) note(
            s"prior candidate has no sf-matching query map ($p) — trying next")
          parsed
        } catch {
          case scala.util.control.NonFatal(e) =>
            note(s"prior candidate unreadable ($p): ${e.getMessage}")
            Map.empty[String, Double]
        }
      (p, m)
    }.find(_._2.nonEmpty).getOrElse(("", Map.empty[String, Double]))

  /** WEATHER DEFENSE for the cross-round flag base (VERDICT r15 item
    * 1): resolve the best readable candidate of each of the newest K
    * prior rounds independently ([[resolvePrior]] within each round's
    * group) and take the PER-QUERY MIN across the resolved maps.
    *
    * Why min, why K rounds: a single newest prior recorded in a
    * degraded window (r15's driver sidecar: 339.9 s total, disk calib
    * 340.8 vs 437.5 MB/s, q69 at 18.40 s vs its healthy 0.52) cannot
    * produce false flags — it MASKS true ones, the worse direction
    * for a regression gate, since a genuine regression to 2 s still
    * reads as a 9× "improvement" against the inflated 18.40. The
    * per-query min over the last few rounds is the healthiest reading
    * any recent round achieved, so one bad-weather round can never
    * lower the bar; it is monotone-safe (a genuine improvement
    * tightens the base only after it lands in a prior round, which is
    * exactly when it becomes the standard to hold). Failed prior runs
    * (negative seconds) never participate in the min — a query that
    * failed in one prior round but ran healthily in another must
    * still flag against the healthy reading.
    *
    * Returns (paths actually merged, merged map); (Nil, empty) when
    * nothing resolves. */
  def resolvePriorPool(pool: Seq[Seq[String]], sfDir: String,
      readText: String => String,
      note: String => Unit = _ => ()): (Seq[String], Map[String, Double]) = {
    val resolved = pool.map(g => resolvePrior(g, sfDir, readText, note))
      .filter(_._2.nonEmpty)
    val merged = resolved.flatMap(_._2).groupMap(_._1)(_._2)
      .map { case (q, vs) =>
        q -> vs.filter(_ > 0).minOption.getOrElse(-1.0)
      }
    (resolved.map(_._1), merged)
  }

  /** Whether this run's full-map line may be persisted as a future
    * round's sidecar prior: never a local-kind sweep (wrong series),
    * never a SPARK_GRAFT_ONLY subset run (a partial map would shrink
    * the next round's flag coverage to the subset). */
  def shouldWriteSidecar(kind: String, subset: Option[String]): Boolean =
    kind != "local" && subset.isEmpty

  /** The round-keyed sidecar filename this run writes (and the next
    * round's [[priorCandidates]] will prefer). */
  def sidecarName(round: Int, sfName: String): String =
    s"BENCH_full_driver_r${round}_$sfName.json"

  /** JSON string literal with full escaping (ADVICE r15): query names
    * are SparkEntry keys and prior paths are POSIX paths today, but a
    * parse failure in this artifact silently zeroes NEXT round's flag
    * coverage — the exact failure class this unit exists to close —
    * so the renderer must not depend on those invariants holding
    * forever. */
  private[graft] def jstr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** JSON number rendering: doubles go via toString (round-trips
    * exactly), but NaN/Infinity are not JSON — they render as -1, the
    * artifact's standing failed-run sentinel, which [[computeFlags]]
    * already never flags against (ADVICE r15: a non-finite leaking
    * into the line would fail the whole parse next round). */
  private[graft] def jnum(d: Double): String =
    if (java.lang.Double.isFinite(d)) d.toString else "-1.0"

  /** Render a flag list as the artifact's JSON array. */
  def flagsToJson(fs: Seq[(String, Double, Double)]): String =
    fs.map { case (n, pv, v) =>
      val ratio = if (pv != 0 && java.lang.Double.isFinite(v / pv))
        f"${v / pv}%.2f" else "-1.0"
      s"""{"q":${jstr(n)},"prior":${jnum(pv)},"now":${jnum(v)},""" +
        s""""ratio":$ratio}""" }
      .mkString("[", ",", "]")

  /** Render the full-precision artifact line — the EXACT shape
    * [[parsePriorQueries]] consumes next round. Writer and parser
    * live in this one unit so they cannot drift apart silently; the
    * round-trip law (render → parse recovers every query at full
    * precision, for the matching sf and only the matching sf) is
    * property-swept in BenchPriorSpec, including hostile names and
    * non-finite values. `priorPaths` is the resolved pool
    * ([[resolvePriorPool]]) — every artifact the flag base merged. */
  def renderFullLine(total: Double, queries: Seq[(String, Double)],
      sfDir: String, calibStart: Double, calibEnd: Double,
      diskMbps: Double, calibs: Seq[(String, Double, Double)],
      flags: Seq[(String, Double, Double)], priorPaths: Seq[String],
      flagsIntra: Seq[(String, Double, Double)],
      intraPath: String): String = {
    val qs = queries.map { case (k, v) => jstr(k) + ":" + jnum(v) }
      .mkString("{", ",", "}")
    val calibArr = calibs.map { case (at, c, io) =>
      s"""{"at":${jstr(at)},"sec":${jnum(c)},"io_mbps":${jnum(io)}}""" }
      .mkString("[", ",", "]")
    val priorArr = priorPaths.map(jstr).mkString("[", ",", "]")
    s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,""" +
      s""""sf":${jstr(sfDir)},"calib":{"start":${jnum(calibStart)},""" +
      s""""end":${jnum(calibEnd)},"disk_mbps":${jnum(diskMbps)}},""" +
      s""""calibs":$calibArr,""" +
      s""""flags":${flagsToJson(flags)},"flags_prior":$priorArr,""" +
      s""""flags_intra":${flagsToJson(flagsIntra)},""" +
      s""""flags_intra_prior":${jstr(intraPath)}}"""
  }

  /** The standing flag rule: a mover is flagged when it reads >1.3×
    * AND >0.3 s over the prior — both bars, so sub-second jitter on
    * tiny queries and small drift on huge ones both stay quiet.
    * Failed runs (negative seconds) on either side never flag. A flag
    * is a to-verify marker for a same-boot A/B, not a verdict. */
  def computeFlags(prior: Map[String, Double],
      results: Seq[(String, Double)], ratio: Double = 1.3,
      absSec: Double = 0.3): Seq[(String, Double, Double)] =
    results.flatMap { case (n, v) =>
      prior.get(n)
        .filter(pv => pv > 0 && v > 0 && v > pv * ratio && v - pv > absSec)
        .map(pv => (n, pv, v))
    }
}
