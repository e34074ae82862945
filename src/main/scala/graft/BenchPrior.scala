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
    * cross-kind diff is environment noise, never a fallback. Callers
    * feed the list to [[resolvePrior]], which walks it until a
    * candidate yields a non-empty sf-matching map — so a corrupt or
    * sf-mismatched sidecar degrades to the next candidate instead of
    * to zero coverage (ADVICE r14).
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
      sfName: String): Seq[String] = {
    val cur = currentRound(fileNames)
    if (kind == "local")
      fileNames.collect { case f @ LocalArtifact(n) => (n.toInt, f) }
        .filter(_._1 < cur).sortBy(-_._1).map(_._2)
    else {
      // rank within a round: sidecar (full map) before artifact
      val ranked =
        fileNames.collect {
          case f @ Sidecar(n, sf) if sf == sfName => (n.toInt, 0, f)
        } ++
        fileNames.collect { case f @ DriverArtifact(n) => (n.toInt, 1, f) }
      val prior = ranked.filter(_._1 < cur)
        .sortBy(t => (-t._1, t._2)).map(_._3)
      if (prior.nonEmpty) prior
      else ranked.collect { case (n, 0, f) if n == cur => f }
    }
  }

  /** The current round's own already-promoted local artifact, if any —
    * the optional SECOND prior for local sweeps (VERDICT r14 item 5):
    * diffing against the round's best window catches intra-round
    * regressions the cross-round prior dilutes. Reported as a separate
    * flag set (`flags_intra`), never mixed into the cross-round
    * series' flags. */
  def intraRoundPrior(kind: String, fileNames: Seq[String]): Option[String] =
    if (kind != "local") None
    else {
      val cur = currentRound(fileNames)
      fileNames.collectFirst {
        case f @ LocalArtifact(n) if n.toInt == cur => f
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

  /** Render a flag list as the artifact's JSON array. */
  def flagsToJson(fs: Seq[(String, Double, Double)]): String =
    fs.map { case (n, pv, v) =>
      f"""{"q":"$n","prior":$pv%.3f,"now":$v%.3f,"ratio":${v / pv}%.2f}""" }
      .mkString("[", ",", "]")

  /** Render the full-precision artifact line — the EXACT shape
    * [[parsePriorQueries]] consumes next round. Writer and parser
    * live in this one unit so they cannot drift apart silently; the
    * round-trip law (render → parse recovers every query at full
    * precision, for the matching sf and only the matching sf) is
    * property-swept in BenchPriorSpec. Query names are SparkEntry
    * keys (identifier-safe, never needing JSON escaping); doubles
    * render via toString, which round-trips exactly. */
  def renderFullLine(total: Double, queries: Seq[(String, Double)],
      sfDir: String, calibStart: Double, calibEnd: Double,
      diskMbps: Double, calibs: Seq[(String, Double, Double)],
      flags: Seq[(String, Double, Double)], priorPath: String,
      flagsIntra: Seq[(String, Double, Double)],
      intraPath: String): String = {
    val qs = queries.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val calibArr = calibs.map { case (at, c, io) =>
      s"""{"at":"$at","sec":$c,"io_mbps":$io}""" }
      .mkString("[", ",", "]")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","calib":{"start":$calibStart,"end":$calibEnd,""" +
      s""""disk_mbps":$diskMbps},"calibs":$calibArr,""" +
      s""""flags":${flagsToJson(flags)},"flags_prior":"$priorPath",""" +
      s""""flags_intra":${flagsToJson(flagsIntra)},""" +
      s""""flags_intra_prior":"$intraPath"}"""
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
