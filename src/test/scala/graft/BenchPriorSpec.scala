package graft

import org.scalatest.funsuite.AnyFunSuite

/** Direct tests on [[BenchPrior]] — the prior-selection and flag
  * logic that decides what the whole perf discipline can see. The
  * inline predecessor produced two consecutive rounds of silent
  * coverage loss (r13: driver runs diffed against a slowest-20
  * artifact; r14: local sweeps diffed against the round's OWN
  * committed artifact), so each historical failure is asserted red
  * here: restoring the bare newest-first pick (dropping the
  * strictly-below-current-round filter) fails the self-prior tests;
  * restoring the take-one-candidate parse fails the fall-through
  * tests; restoring the exact-string sf compare fails the
  * canonical-sf tests.
  */
class BenchPriorSpec extends AnyFunSuite {

  // a repo listing mid-round-15: driver artifacts through r14 (the
  // round clock), local artifacts through r15 (the round's own,
  // already promoted), both sidecar generations
  private val midRound15 = Seq(
    "BENCH_r13.json", "BENCH_r14.json",
    "BENCH_r13_local.json", "BENCH_r14_local.json", "BENCH_r15_local.json",
    "BENCH_full_driver_r14_sf0.1.json", "BENCH_full_driver_r15_sf0.1.json",
    "BENCH_full_driver_r14_sf0.01.json",
    "CORRECTNESS_r14.json", "SURVEY.md", "src")

  test("currentRound: one past the newest driver artifact; locals and sidecars are not the clock") {
    assert(BenchPrior.currentRound(midRound15) == 15)
    assert(BenchPrior.currentRound(Seq("BENCH_r3.json", "BENCH_r14.json")) == 15)
    // locals running ahead must not advance the clock
    assert(BenchPrior.currentRound(
      Seq("BENCH_r14.json", "BENCH_r15_local.json",
        "BENCH_full_driver_r15_sf0.1.json")) == 15)
    assert(BenchPrior.currentRound(Seq("SURVEY.md")) == 1)
    assert(BenchPrior.currentRound(Nil) == 1)
  }

  test("local kind: self-prior excluded — the r14 defect") {
    // during round 15, with the round's own BENCH_r15_local.json
    // already committed, the prior must be r14_local, never r15_local
    val c = BenchPrior.priorCandidates("local", midRound15, "sf0.1")
    assert(c == Seq("BENCH_r14_local.json", "BENCH_r13_local.json"),
      s"a bare newest-first pick would put BENCH_r15_local.json (self) first; got $c")
  }

  test("local kind: only the local series, never driver artifacts or sidecars") {
    val c = BenchPrior.priorCandidates("local",
      Seq("BENCH_r14.json", "BENCH_full_driver_r14_sf0.1.json"), "sf0.1")
    assert(c.isEmpty, s"cross-kind priors are noise, not a fallback; got $c")
  }

  test("driver kind: round-keyed sidecar preferred, self-round excluded, sf filtered, artifact fallback ordered") {
    val c = BenchPrior.priorCandidates("driver", midRound15, "sf0.1")
    assert(c == Seq(
      "BENCH_full_driver_r14_sf0.1.json", // newest prior-round sidecar, right sf
      "BENCH_r14.json", "BENCH_r13.json"), // slowest-20 artifacts, newest first
      s"got $c")
    assert(!c.contains("BENCH_full_driver_r15_sf0.1.json"),
      "the current round's own sidecar (a re-run or stray same-sf run) must never be the prior")
    assert(!c.contains("BENCH_full_driver_r14_sf0.01.json"),
      "another scale factor's sidecar must never be the prior")
  }

  test("driver kind: candidates ordered by round first — a missing newest sidecar degrades to that round's artifact, never to an older sidecar") {
    // independent-review finding on the first r15 cut: ranking ALL
    // sidecars ahead of ALL artifacts made a missing r16 sidecar fall
    // back to a three-round-stale r14 sidecar instead of r16's own
    // slowest-20 artifact
    val files = Seq("BENCH_r13.json", "BENCH_r14.json", "BENCH_r16.json",
      "BENCH_full_driver_r14_sf0.1.json") // r16 sidecar never written
    val c = BenchPrior.priorCandidates("driver", files, "sf0.1")
    assert(c == Seq("BENCH_r16.json", // round beats sidecar-ness…
      "BENCH_full_driver_r14_sf0.1.json", "BENCH_r14.json", // …within a round the full map wins
      "BENCH_r13.json"), s"got $c")
  }

  test("driver kind: the legacy unkeyed sidecar name is never read (it carries no round, so it could self-prior)") {
    val files = Seq("BENCH_r14.json", "BENCH_full_driver_sf0.1.json")
    assert(BenchPrior.priorCandidates("driver", files, "sf0.1") ==
      Seq("BENCH_r14.json"))
  }

  test("driver kind: fresh-dir fallback — with no round clock, the previous run's same-round sidecar beats zero coverage") {
    // a working dir without the committed BENCH_r*.json series:
    // currentRound is pinned at 1, so the strictly-below filter alone
    // would exclude the sidecar every run writes, forever
    val fresh = Seq("BENCH_full_driver_r1_sf0.1.json", "SURVEY.md")
    assert(BenchPrior.priorCandidates("driver", fresh, "sf0.1") ==
      Seq("BENCH_full_driver_r1_sf0.1.json"))
    // the fallback never fires when any prior-round candidate exists
    val normal = Seq("BENCH_r14.json", "BENCH_full_driver_r15_sf0.1.json")
    assert(BenchPrior.priorCandidates("driver", normal, "sf0.1") ==
      Seq("BENCH_r14.json"),
      "a same-round sidecar must stay excluded while a real prior exists")
    // and never for local kind
    assert(BenchPrior.priorCandidates("local",
      Seq("BENCH_r1_local.json"), "sf0.1").isEmpty)
  }

  test("canonicalSf: absolute, relative, and trailing-slash spellings collapse to the basename") {
    for (s <- Seq("/root/testdata/sf0.1", "sf0.1", "/root/testdata/sf0.1/",
        "testdata/sf0.1", "/root/testdata/sf0.1//"))
      assert(BenchPrior.canonicalSf(s) == "sf0.1", s"for input '$s'")
    assert(BenchPrior.canonicalSf("/root/testdata/sf0.01") == "sf0.01")
  }

  test("parsePriorQueries: biggest sf-matching map wins across line and whole-object shapes") {
    val text =
      """{"metric":"total","queries":{"q1":1.0,"q2":2.0,"q3":3.0},"sf":"/root/testdata/sf0.1"}
        |{"metric":"total","queries":{"q1":1.000},"sf":"/root/testdata/sf0.1"}
        |""".stripMargin
    val m = BenchPrior.parsePriorQueries(text, "/root/testdata/sf0.1")
    assert(m == Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 3.0))
  }

  test("parsePriorQueries: sf matched canonically — respelled path still parses (the ADVICE hole)") {
    val text = """{"queries":{"q1":1.5},"sf":"/root/testdata/sf0.1"}"""
    // pre-r15 this exact-string compare parsed 0 queries and flag
    // coverage silently dropped to zero
    assert(BenchPrior.parsePriorQueries(text, "sf0.1") == Map("q1" -> 1.5))
    assert(BenchPrior.parsePriorQueries(text, "/root/testdata/sf0.1/") ==
      Map("q1" -> 1.5))
    // …while a genuinely different sf still filters out
    assert(BenchPrior.parsePriorQueries(text, "/root/testdata/sf0.01").isEmpty)
  }

  test("parsePriorQueries: driver artifact shape (query map under \"parsed\")") {
    val text =
      """{ "round": 14,
        |  "parsed": {"metric":"total","queries":{"q7":4.2},"sf":"/root/testdata/sf0.1"} }
        |""".stripMargin
    assert(BenchPrior.parsePriorQueries(text, "sf0.1") == Map("q7" -> 4.2))
  }

  test("resolvePrior: corrupt and sf-mismatched candidates degrade to the next, loudly") {
    val texts = Map(
      "corrupt.json" -> "not json at all {{{",
      "wrong_sf.json" -> """{"queries":{"q1":9.9},"sf":"sf0.01"}""",
      "good.json" -> """{"queries":{"q1":1.0,"q2":2.0},"sf":"sf0.1"}""")
    val notes = scala.collection.mutable.ListBuffer[String]()
    val reader: String => String =
      p => texts.getOrElse(p, throw new java.io.FileNotFoundException(p))
    val (path, m) = BenchPrior.resolvePrior(
      Seq("missing.json", "corrupt.json", "wrong_sf.json", "good.json"),
      "/root/testdata/sf0.1", reader, notes += _)
    assert(path == "good.json" && m == Map("q1" -> 1.0, "q2" -> 2.0))
    // every skipped candidate is noted (missing→unreadable,
    // corrupt→no map, wrong sf→no map); silence was the pre-r15 bug
    assert(notes.size == 3, notes.mkString("; "))
    assert(notes.exists(_.contains("missing.json")))
    assert(notes.exists(_.contains("wrong_sf.json")))
  }

  test("resolvePrior: all candidates bad → no prior, no flags, stated") {
    val (path, m) = BenchPrior.resolvePrior(
      Seq("a", "b"), "sf0.1", _ => "garbage", _ => ())
    assert(path == "" && m.isEmpty)
    assert(BenchPrior.computeFlags(m, Seq("q1" -> 100.0)).isEmpty)
  }

  test("shouldWriteSidecar: never local kind, never a subset run") {
    assert(BenchPrior.shouldWriteSidecar("driver", None))
    assert(!BenchPrior.shouldWriteSidecar("local", None))
    assert(!BenchPrior.shouldWriteSidecar("driver", Some("st2")))
    assert(!BenchPrior.shouldWriteSidecar("local", Some("st2")))
  }

  test("sidecarName is round-keyed and sf-keyed") {
    assert(BenchPrior.sidecarName(15, "sf0.1") ==
      "BENCH_full_driver_r15_sf0.1.json")
  }

  test("intraRoundPrior: local kind sees this round's promoted window") {
    assert(BenchPrior.intraRoundPrior("local", midRound15, "sf0.1") ==
      Some("BENCH_r15_local.json"))
    // not yet promoted this round → none
    assert(BenchPrior.intraRoundPrior("local",
      Seq("BENCH_r14.json", "BENCH_r14_local.json"), "sf0.1").isEmpty)
  }

  test("intraRoundPrior: driver kind sees this round's own sidecar (a previous same-round run), sf-filtered — VERDICT r15 item 5") {
    assert(BenchPrior.intraRoundPrior("driver", midRound15, "sf0.1") ==
      Some("BENCH_full_driver_r15_sf0.1.json"))
    // never another scale factor's, never a prior round's
    assert(BenchPrior.intraRoundPrior("driver", midRound15, "sf0.01").isEmpty,
      "r15's sf0.01 sidecar does not exist; the sf0.01 file present is r14's (prior round)")
    assert(BenchPrior.intraRoundPrior("driver",
      Seq("BENCH_r14.json", "BENCH_full_driver_r14_sf0.1.json"),
      "sf0.1").isEmpty,
      "the prior round's sidecar is the CROSS prior, never the intra one")
  }

  test("local kind without a driver round clock: the local series' own max round is the clock (ADVICE r15)") {
    // a checkout holding only promoted local sweeps: currentRound pins
    // at 1, and pre-r16 the strictly-below filter excluded EVERY local
    // prior — including a genuine earlier round's — zeroing coverage
    val files = Seq("BENCH_r13_local.json", "BENCH_r14_local.json", "SURVEY.md")
    assert(BenchPrior.priorCandidates("local", files, "sf0.1") ==
      Seq("BENCH_r13_local.json"),
      "the earlier local must qualify as the cross-round prior")
    // the newest local can't be proven non-self without a driver
    // clock, so it serves as the intra prior instead
    assert(BenchPrior.intraRoundPrior("local", files, "sf0.1") ==
      Some("BENCH_r14_local.json"))
    // with any driver artifact present, the driver series is the clock
    assert(BenchPrior.priorCandidates("local",
      files :+ "BENCH_r14.json", "sf0.1") ==
      Seq("BENCH_r14_local.json", "BENCH_r13_local.json"))
  }

  test("round-trip law: renderFullLine → parsePriorQueries recovers every query at full precision (seeded sweep)") {
    // writer and parser live in the same unit; this law is what keeps
    // them from drifting apart silently — the failure mode behind the
    // r13/r14 coverage losses was always the parser seeing something
    // other than what the writer meant
    val rnd = new scala.util.Random(41)
    val words = Vector("q", "agg", "join", "dedup", "ann", "stream", "text")
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val queries = (0 until n).map { i =>
        val name = s"${words(rnd.nextInt(words.size))}${i}_${words(rnd.nextInt(words.size))}"
        // full double precision, negatives (failed runs) included —
        // they must survive the round trip too
        val v = if (rnd.nextInt(20) == 0) -1.0
                else rnd.nextDouble() * math.pow(10, rnd.nextInt(3))
        name -> v
      }
      val sfDir = Seq("/root/testdata/sf0.1", "sf0.1", "testdata/sf0.1/")(rnd.nextInt(3))
      val calibs = Seq(("start", 0.35, 420.0), ("end", 0.4, 380.0))
      val flags = if (rnd.nextBoolean()) Seq(("q1", 1.0, 1.5)) else Nil
      val line = BenchPrior.renderFullLine(
        queries.map(_._2).filter(_ >= 0).sum, queries, sfDir,
        0.35, 0.4, 450.0, calibs, flags, Seq("/p/prior.json"), Nil, "")
      // any same-sf spelling recovers the exact map…
      assert(BenchPrior.parsePriorQueries(line, "/root/testdata/sf0.1") ==
        queries.toMap, s"round-trip failed for sfDir=$sfDir")
      // …and a different sf recovers nothing
      assert(BenchPrior.parsePriorQueries(line, "sf0.01").isEmpty)
    }
  }

  test("priorPool: candidates grouped by prior round, newest first, capped at k; flattening is priorCandidates") {
    val pool = BenchPrior.priorPool("driver", midRound15, "sf0.1", k = 3)
    assert(pool == Seq(
      Seq("BENCH_full_driver_r14_sf0.1.json", "BENCH_r14.json"),
      Seq("BENCH_r13.json")), s"got $pool")
    assert(BenchPrior.priorPool("driver", midRound15, "sf0.1", k = 1) ==
      Seq(Seq("BENCH_full_driver_r14_sf0.1.json", "BENCH_r14.json")))
    // local kind: one candidate per round
    assert(BenchPrior.priorPool("local", midRound15, "sf0.1", k = 3) ==
      Seq(Seq("BENCH_r14_local.json"), Seq("BENCH_r13_local.json")))
  }

  test("weather defense: a degraded newest prior must not mask a regression the healthy round-before would flag — VERDICT r15 item 1") {
    // the exact r15→r16 shape: the newest prior round's sidecar was
    // recorded in a degraded window (q69 at 18.40 s; its healthy r14
    // reading was 0.52 s). This run regresses q69 to 2.0 s — a real
    // 3.8× regression vs healthy that reads as a 9× "improvement" vs
    // the degraded prior.
    val texts = Map(
      "BENCH_full_driver_r15_sf0.1.json" ->
        """{"queries":{"q69":18.40,"q01":0.9},"sf":"sf0.1"}""",
      "BENCH_full_driver_r14_sf0.1.json" ->
        """{"queries":{"q69":0.52,"q01":0.95},"sf":"sf0.1"}""")
    val files = texts.keys.toSeq ++ Seq("BENCH_r14.json", "BENCH_r15.json")
    val pool = BenchPrior.priorPool("driver", files, "sf0.1")
    val (paths, merged) = BenchPrior.resolvePriorPool(pool, "sf0.1",
      p => texts.getOrElse(p, """{"queries":{},"sf":"sf0.1"}"""))
    assert(paths == Seq("BENCH_full_driver_r15_sf0.1.json",
      "BENCH_full_driver_r14_sf0.1.json"))
    // the merged base is the per-query min: the healthiest recent reading
    assert(merged("q69") == 0.52 && merged("q01") == 0.9)
    val flags = BenchPrior.computeFlags(merged, Seq("q69" -> 2.0, "q01" -> 1.0))
    assert(flags == Seq(("q69", 0.52, 2.0)),
      "the regression must flag against the healthy r14 base")
    // the r15-era mutation, red: a single newest prior masks it
    val (_, newestOnly) = BenchPrior.resolvePriorPool(pool.take(1), "sf0.1",
      p => texts.getOrElse(p, """{"queries":{},"sf":"sf0.1"}"""))
    assert(BenchPrior.computeFlags(newestOnly, Seq("q69" -> 2.0)).isEmpty,
      "this is the masking failure the pool exists to close")
  }

  test("weather defense: a failed prior run never participates in the min") {
    val pool = Seq(Seq("a.json"), Seq("b.json"))
    val texts = Map(
      "a.json" -> """{"queries":{"q1":-1.0},"sf":"sf0.1"}""",
      "b.json" -> """{"queries":{"q1":0.5},"sf":"sf0.1"}""")
    val (_, merged) = BenchPrior.resolvePriorPool(pool, "sf0.1", texts(_))
    // min(-1, 0.5) = -1 would disable flagging for q1 entirely
    assert(merged("q1") == 0.5)
    // …and a query that failed in EVERY prior stays unflaggable
    val (_, allFailed) = BenchPrior.resolvePriorPool(
      Seq(Seq("a.json")), "sf0.1", texts(_))
    assert(BenchPrior.computeFlags(allFailed, Seq("q1" -> 100.0)).isEmpty)
  }

  test("resolvePriorPool laws: union of keys, per-key min of positives, group-order-independent merge, more rounds never raise the base (seeded sweep)") {
    val rnd = new scala.util.Random(163)
    (1 to 200).foreach { _ =>
      // random pool: up to 4 round groups, each with one readable
      // candidate carrying a random query map (negatives = failed
      // runs); some groups corrupt entirely
      val nGroups = 1 + rnd.nextInt(4)
      val texts = scala.collection.mutable.Map[String, String]()
      val pool = (0 until nGroups).map { g =>
        val name = s"r$g.json"
        if (rnd.nextInt(5) == 0) texts(name) = "corrupt {{{"
        else {
          val qs = (0 until rnd.nextInt(6)).map { i =>
            val v = if (rnd.nextInt(4) == 0) -1.0 else rnd.nextDouble() * 10
            s""""q$i":$v"""
          }.mkString(",")
          texts(name) = s"""{"queries":{$qs},"sf":"sf0.1"}"""
        }
        Seq(name)
      }
      val read: String => String = texts(_)
      // k unbounded here: the laws are about the MERGE (the lazy
      // first-k-non-empty selection gets its own test above), and an
      // order-reversed pool must resolve the same rounds for law 3
      val (paths, merged) = BenchPrior.resolvePriorPool(pool, "sf0.1", read,
        k = Int.MaxValue)
      val resolvedMaps = paths.map(p =>
        BenchPrior.parsePriorQueries(texts(p), "sf0.1"))
      // law 1: merged keys are exactly the union of the resolved maps'
      // (these fixtures carry no "base" field; the base carry's keys
      // are pinned in its own tests above)
      assert(merged.keySet == resolvedMaps.flatMap(_.keySet).toSet)
      // law 2: each value is the min of the positives for that key —
      // a failed run never drags the base down; all-failed stays
      // unflaggable (-1)
      merged.foreach { case (k, v) =>
        val vs = resolvedMaps.flatMap(_.get(k)).filter(_ > 0)
        assert(v == (if (vs.nonEmpty) vs.min else -1.0), s"key $k")
      }
      // law 3: the merge is group-order-independent (the PATH order is
      // reporting; the BASE must not depend on which round is newest)
      val (_, reversed) = BenchPrior.resolvePriorPool(pool.reverse, "sf0.1",
        read, k = Int.MaxValue)
      assert(reversed == merged)
      // law 4: adding rounds never RAISES the base on shared keys —
      // min is monotone, so a truncated pool is always >= the full one
      val (_, truncated) = BenchPrior.resolvePriorPool(pool.take(1), "sf0.1", read)
      truncated.foreach { case (k, v) =>
        if (v > 0 && merged.getOrElse(k, -1.0) > 0)
          assert(merged(k) <= v, s"key $k: full pool raised the base")
      }
    }
  }

  test("resolvePriorPool: corrupt groups degrade within themselves; all-bad pool is (Nil, empty)") {
    val texts = Map(
      "r15_sidecar" -> "garbage {{{",
      "r15_artifact" -> """{"parsed":{"queries":{"q1":3.0},"sf":"sf0.1"}}""",
      "r14_sidecar" -> """{"queries":{"q1":1.0,"q2":2.0},"sf":"sf0.1"}""")
    val (paths, merged) = BenchPrior.resolvePriorPool(
      Seq(Seq("r15_sidecar", "r15_artifact"), Seq("r14_sidecar")),
      "sf0.1", texts(_))
    // the corrupt r15 sidecar fell through to r15's artifact WITHIN
    // the round group; the merge still spans both rounds
    assert(paths == Seq("r15_artifact", "r14_sidecar"))
    assert(merged == Map("q1" -> 1.0, "q2" -> 2.0))
    val (p2, m2) = BenchPrior.resolvePriorPool(
      Seq(Seq("x")), "sf0.1", _ => "garbage")
    assert(p2.isEmpty && m2.isEmpty)
  }

  test("renderFullLine: hostile names and non-finite values still render valid JSON (ADVICE r15)") {
    val hostile = Seq(
      """q_with_"quote""" -> 1.5,
      "q_with_\\backslash" -> Double.NaN,
      "q_with_\ncontrol" -> Double.PositiveInfinity,
      "q_plain" -> 2.0)
    val line = BenchPrior.renderFullLine(Double.NaN, hostile,
      "/tmp/sf dir/\"x\"", Double.NegativeInfinity, 0.4, Double.NaN,
      Seq(("at\"weird", Double.NaN, 1.0)),
      Seq(("f\"lag", 0.0, 1.0)), Seq("/p/pr\"ior.json"), Nil, "in\"tra")
    // must be ONE parseable JSON object — a parse failure here would
    // silently zero next round's flag coverage
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(line)
    assert(node.get("queries").size() == 4)
    // non-finite values render as the failed-run sentinel
    assert(node.get("queries").get("q_with_\\backslash").asDouble() == -1.0)
    assert(node.get("value").asDouble() == -1.0)
    // escaped names round-trip exactly through the real parser
    val m = BenchPrior.parsePriorQueries(line, "/tmp/sf dir/\"x\"")
    assert(m("""q_with_"quote""") == 1.5 && m("q_plain") == 2.0)
    // a zero-prior flag renders ratio as the sentinel, not Infinity
    assert(node.get("flags").get(0).get("ratio").asDouble() == -1.0)
  }

  test("parsePriorCpus + intraCpuCompatible: cross-core-count intra priors are refused; legacy artifacts pass") {
    // written since r19: the full line records its core count
    val line = BenchPrior.renderFullLine(1.0, Seq("q1" -> 1.0), "sf0.1",
      0.35, 0.4, 450.0, Nil, Nil, Nil, Nil, "", cpus = 32)
    assert(BenchPrior.parsePriorCpus(line, "sf0.1") == Some(32))
    assert(BenchPrior.intraCpuCompatible(line, "sf0.1", 32))
    // the r18 hole: an 8-cpu scaling run's map in the next round's
    // sidecar slot must NOT serve a 32-cpu run as "environment by
    // construction"
    assert(!BenchPrior.intraCpuCompatible(line, "sf0.1", 8))
    // legacy artifacts (no cpus field) stay compatible — local sweeps
    // are constant-core and losing their intra coverage is the bigger
    // harm
    val legacy = """{"queries":{"q1":5.0},"sf":"sf0.1"}"""
    assert(BenchPrior.parsePriorCpus(legacy, "sf0.1").isEmpty)
    assert(BenchPrior.intraCpuCompatible(legacy, "sf0.1", 32))
    // cpus must ride the sf-selected node, like every other accessor
    assert(BenchPrior.parsePriorCpus(line, "sf0.01").isEmpty)
  }

  test("parsePriorBase: read from the same node parsePriorQueries selects; pre-r17 artifacts carry none") {
    val withBase =
      """{"queries":{"q1":5.0},"sf":"sf0.1","base":{"q1":0.5,"q2":0.7}}"""
    assert(BenchPrior.parsePriorBase(withBase, "sf0.1") ==
      Map("q1" -> 0.5, "q2" -> 0.7))
    // pre-r17 shape (no base field) → empty, the carry starts fresh
    assert(BenchPrior.parsePriorBase(
      """{"queries":{"q1":5.0},"sf":"sf0.1"}""", "sf0.1").isEmpty)
    // sf mismatch filters the whole node out, base included
    assert(BenchPrior.parsePriorBase(withBase, "sf0.01").isEmpty)
    // the base must ride the SELECTED node: the bigger query map wins,
    // so the smaller line's base must not leak in
    val twoLines =
      """{"queries":{"q1":1.0},"sf":"sf0.1","base":{"q9":9.9}}
        |{"queries":{"q1":1.0,"q2":2.0},"sf":"sf0.1","base":{"q1":0.4}}
        |""".stripMargin
    assert(BenchPrior.parsePriorBase(twoLines, "sf0.1") == Map("q1" -> 0.4))
  }

  test("base carry: three consecutive degraded rounds still flag against the rotated-out healthy reading — VERDICT r16 item 3") {
    // the decay scenario VERDICT r16 named: r14 was the last healthy
    // window (q1 at 0.5 s); r15–r17 all ran degraded (q1 at ~5 s).
    // Round 18's K=3 pool is r17+r16+r15 — r14 has rotated out of the
    // round window. Without the carry the bar inflates to 5.0 and a
    // real regression to 2.0 sails through; WITH it, each degraded
    // round's sidecar recorded the merged base it flagged against
    // (0.5, transitively from r14), and the min folds it back in.
    def sidecar(reading: Double, base: String) =
      s"""{"queries":{"q1":$reading},"sf":"sf0.1","base":$base}"""
    val texts = Map(
      "r17.json" -> sidecar(5.2, """{"q1":0.5}"""),
      "r16.json" -> sidecar(5.1, """{"q1":0.5}"""),
      "r15.json" -> sidecar(5.0, """{"q1":0.5}"""))
    val pool = Seq(Seq("r17.json"), Seq("r16.json"), Seq("r15.json"))
    val (_, merged) = BenchPrior.resolvePriorPool(pool, "sf0.1", texts(_))
    assert(merged("q1") == 0.5,
      s"the carried base must survive the healthy round rotating out; got $merged")
    assert(BenchPrior.computeFlags(merged, Seq("q1" -> 2.0)) ==
      Seq(("q1", 0.5, 2.0)))
    // the mutation, red: strip the carried bases (the pre-r17 shape)
    // and the bar quietly inflates to the degraded readings' min
    val stripped = texts.map { case (k, _) =>
      k -> s"""{"queries":{"q1":5.0},"sf":"sf0.1"}""" }
    val (_, decayed) = BenchPrior.resolvePriorPool(pool, "sf0.1", stripped(_))
    assert(decayed("q1") == 5.0 &&
      BenchPrior.computeFlags(decayed, Seq("q1" -> 2.0)).isEmpty,
      "this is the rolling-decay failure the carry exists to close")
    // a failed-run sentinel in a carried base never participates
    val withNeg = Map("r17.json" -> sidecar(5.2, """{"q1":-1.0,"q3":0.2}"""))
    val (_, m2) = BenchPrior.resolvePriorPool(Seq(Seq("r17.json")), "sf0.1",
      withNeg(_))
    assert(m2("q1") == 5.2 && m2("q3") == 0.2)
  }

  test("resolvePriorPool: a round resolving to nothing falls through to round k+1 (ADVICE r16)") {
    // pre-fix, priorPool.take(k) ran BEFORE resolution: a fully
    // corrupt round SHRANK the merge to k−1 rounds instead of letting
    // the next-older round in
    val texts = Map(
      "r16.json" -> """{"queries":{"q1":3.0},"sf":"sf0.1"}""",
      "r15.json" -> "corrupt {{{",
      "r14.json" -> """{"queries":{"q1":2.0},"sf":"sf0.1"}""",
      "r13.json" -> """{"queries":{"q1":1.0},"sf":"sf0.1"}""",
      "r12.json" -> """{"queries":{"q1":0.1},"sf":"sf0.1"}""")
    val pool = Seq("r16.json", "r15.json", "r14.json", "r13.json", "r12.json")
      .map(Seq(_))
    val (paths, merged) = BenchPrior.resolvePriorPool(pool, "sf0.1", texts(_))
    assert(paths == Seq("r16.json", "r14.json", "r13.json"),
      s"the corrupt r15 round must fall through to r13, and r12 stays outside k=3; got $paths")
    assert(merged("q1") == 1.0)
  }

  test("renderCompactLine size law: bounded under the driver's tail window at the worst case — every query flagged, real names (VERDICT r16 item 1)") {
    // the r16 failure: 80 flag names inline grew the line to ~2.6 KB
    // against the driver's 2000-char stdout tail, and the committed
    // official BENCH_r16.json landed parsed:null. The law: at the
    // absolute worst case — all 207 real queries flagged — the line
    // still fits, with n_flags carrying the true count.
    val names = SparkEntry.queries.keys.toSeq.sorted
    assert(names.size >= 200, "worst case must be the real query set")
    val results = names.map(_ -> 12.345678)
    val flags = names.map(n => (n, 0.301, 12.345678))
    val line = BenchPrior.renderCompactLine(2556.0, results,
      "/root/testdata/sf0.1", 0.35, 0.41, 450.0, flags,
      nFlagsIntra = 111, nRetryWeather = 207)
    assert(line.length <= 1900, s"line is ${line.length} chars")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(line)
    assert(node.get("n_flags").asInt() == names.size,
      "the true flag count must survive the elision")
    assert(node.get("queries").size() == 20, "the slowest-20 map is the driver's parsed view")
    assert(node.get("flags").size() < names.size && node.get("flags").size() > 0)
    assert(node.get("flags_note").asText().startsWith("first "))
    assert(node.get("n_flags_retry_weather").asInt() == 207)
    // …and a healthy window elides nothing
    val smallLine = BenchPrior.renderCompactLine(253.6, results,
      "/root/testdata/sf0.1", 0.35, 0.41, 450.0, flags.take(7),
      nFlagsIntra = 1, nRetryWeather = 7)
    val smallNode = om.readTree(smallLine)
    assert(smallNode.get("flags").size() == 7 &&
      smallNode.get("flags_note").asText() == "all")
    assert(smallLine.length <= 1900)
  }

  test("renderCompactLine: non-finite numerics render as the sentinel, never NaN/Infinity (ADVICE r16)") {
    // the compact line's numbers went through raw %f interpolation
    // pre-r17 — one NaN total would have broken the official
    // artifact's parse, the exact failure class jstr/jnum closed for
    // the full line
    val line = BenchPrior.renderCompactLine(Double.NaN,
      Seq("q1" -> Double.PositiveInfinity, "q2" -> 1.0), "sf0.1",
      Double.NegativeInfinity, Double.NaN, Double.NaN,
      Seq(("q1", 0.5, 2.0)), 0, 0)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(line) // must parse at all
    assert(node.get("value").asDouble() == -1.0)
    assert(node.get("calib").get("start").asDouble() == -1.0)
    assert(node.get("calib").get("disk_mbps").asDouble() == -1.0)
    assert(node.get("queries").get("q1").asDouble() == -1.0)
  }

  test("retryVerdict and retry-annotated flags: weather lands at base, stands crosses both bars, failed adjudicates nothing — VERDICT r16 item 4") {
    assert(BenchPrior.retryVerdict(1.0, 1.1) == "weather") // back at base
    assert(BenchPrior.retryVerdict(0.2, 0.45) == "weather") // 2.25× but +0.25 s — under the abs bar, computeFlags wouldn't flag either
    assert(BenchPrior.retryVerdict(1.0, 2.0) == "stands")
    assert(BenchPrior.retryVerdict(1.0, -1.0) == "failed")
    val js = BenchPrior.flagsToJson(
      Seq(("qa", 1.0, 2.0), ("qb", 1.0, 2.0), ("qc", 1.0, 2.0)),
      retries = Map("qa" -> 1.05, "qb" -> 1.9))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = om.readTree(js)
    assert(arr.get(0).get("retry").asDouble() == 1.05 &&
      arr.get(0).get("retry_verdict").asText() == "weather")
    assert(arr.get(1).get("retry_verdict").asText() == "stands")
    assert(!arr.get(2).has("retry"), "no retry reading → no retry fields")
  }

  test("renderFullLine writes the base and retries; parsePriorBase recovers the base through the real parser") {
    val line = BenchPrior.renderFullLine(10.0,
      Seq("q1" -> 5.0, "q2" -> 1.0), "sf0.1", 0.3, 0.4, 400.0,
      Seq(("start", 0.3, 400.0)), Seq(("q1", 0.5, 5.0)), Seq("/p/prior"),
      Nil, "", base = Map("q1" -> 0.5, "q2" -> 0.9),
      retries = Map("q1" -> 0.52))
    assert(BenchPrior.parsePriorBase(line, "sf0.1") ==
      Map("q1" -> 0.5, "q2" -> 0.9))
    assert(BenchPrior.parsePriorQueries(line, "sf0.1") ==
      Map("q1" -> 5.0, "q2" -> 1.0))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val flag = om.readTree(line).get("flags").get(0)
    assert(flag.get("retry").asDouble() == 0.52 &&
      flag.get("retry_verdict").asText() == "weather")
    // the carry, end-to-end: next round resolving THIS line as a
    // prior must min the recorded base into its own flag base
    val (_, merged) = BenchPrior.resolvePriorPool(
      Seq(Seq("me.json")), "sf0.1", _ => line)
    assert(merged == Map("q1" -> 0.5, "q2" -> 0.9))
  }

  test("computeFlags: both bars required; failed runs on either side never flag") {
    val prior = Map("ratio_only" -> 0.2, "abs_only" -> 10.0,
      "both" -> 1.0, "prior_failed" -> -1.0, "now_failed" -> 1.0)
    val now = Seq(
      "ratio_only" -> 0.45, // 2.25× but +0.25 s — under the abs bar
      "abs_only" -> 11.0, // +1.0 s but 1.1× — under the ratio bar
      "both" -> 1.5, // 1.5× and +0.5 s — flagged
      "prior_failed" -> 5.0, // prior run failed — never flag
      "now_failed" -> -1.0, // this run failed — bench reports n_failed
      "new_query" -> 9.0) // no prior entry — nothing to compare
    assert(BenchPrior.computeFlags(prior, now) ==
      Seq(("both", 1.0, 1.5)))
  }
}
