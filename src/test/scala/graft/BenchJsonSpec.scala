package graft

import org.scalatest.funsuite.AnyFunSuite

/** The compact second Bench line is the one the driver's 2000-char
  * tail-capture window must always hold (BENCH_r07 overflowed it →
  * "parsed": null, and the round's perf data was lost). r13 measured
  * the rendered line at 1493 chars and ADVICE flagged that a dozen
  * more headline queries would overflow it again — so the renderer is
  * now a pure function and this spec gates its length at WORST-CASE
  * shapes: every optional block present, the med map at its cap, long
  * realistic query names, -1 error sentinels. Headroom, not the
  * cliff, is the bound. r16 (VERDICT r15 task 7): the forced block's
  * index-keying and the skew key shortening bought the bound down to
  * 1600 at the 4-med cap, with a demonstrated SPARE fifth med slot
  * still under the old 1700 line — the slots the widened MedBand
  * (task 4) can now fill.
  */
class BenchJsonSpec extends AnyFunSuite {

  private def worstCase(
      names: Seq[String], medCap: Int = 4, hd: Boolean = true): String = {
    val mins = names.zipWithIndex.map { case (n, i) =>
      // one errored query (renders "-1"), the rest 4-dp values at a
      // pathologically slow magnitude (>=100 s per query) so the bound
      // covers value WIDTHS, not just value shapes
      n -> (if (i == 3) None else Some(123.4567 + i * 0.01))
    }
    Bench.compactJson(
      total = 12345.6789,
      mins = mins,
      anchors = Bench.anchors.map { case (a, _) => a -> 123.4567 },
      drift = Some(("BENCH_r99.json", 11.07, names.map(_ => Some(12.34)))),
      sr = Some(names.map(_ => Some(123.45))),
      // med at its cap, with the longest plausible keys: the
      // "f:"-prefixed forced names (VERDICT r14 task 2 excursions)
      med = (Bench.forcedQueries.map("f:" + _) ++ names).take(medCap)
        .map(n => n -> 123.4567),
      forced = Bench.forcedQueries.map(n => n -> Some(123.4567)),
      fdc = Some(Bench.forcedQueries.map(_ => Some(12.34))),
      skewBase = Some((123.4567, 23.4567)),
      skewAmp = Some((345.6789, 12.3456)),
      sfDir = "/root/testdata/sf0.1",
      // worst case includes the host-drift stamp (r17): a contaminated
      // round's line must also fit the driver window
      hostDrift = hd,
      // r18: 7 base passes as flat (start, end) pairs at a
      // pathological 5-digit offset magnitude (a >3 h run) — the
      // widest "pw" shape
      pw = (0 until 14).map(p => 12345.6 + p),
      // r20: the baseline-chain evidence field at its widest plausible
      // magnitude — bea CAN appear on a CLEAN line (a quiet run whose
      // baseline chain is contaminated is exactly the r20 case), so
      // both worst cases carry it
      baselineEffAr = Some(12.34))
  }

  test("compact line fits the driver tail window with headroom") {
    // 1775 (r20): the r18 bound (1760 — the r16 trim's 1600 plus "pw"
    // ~110 and "baseline" ~30) plus the r20 baseline-chain evidence
    // field (`,"bea":12.34`, 12 chars, rendered only when the chain is
    // contaminated but counted in the worst case because it CAN ride a
    // clean line) — measured 1766 at the pathological worst case;
    // ~225 chars of window headroom remain. A CONTAMINATED round
    // carries the 7-char `"hd":1,` stamp on top — gated at 1785 so
    // the stamp can never be the overflow.
    val clean = worstCase(SparkEntry.headline, hd = false)
    info(s"worst-case clean compact line: ${clean.length} chars (driver window 2000)")
    assert(clean.length <= 1775,
      s"compact line is ${clean.length} chars — the driver tail-capture " +
        "window is 2000; trim a block or shorten keys before adding queries")
    val stamped = worstCase(SparkEntry.headline)
    info(s"worst-case stamped compact line: ${stamped.length} chars")
    assert(stamped.length <= 1785,
      s"host-drift-stamped line is ${stamped.length} chars")
  }

  test("spare med slot: a FIFTH median entry still fits the pre-trim bound") {
    // VERDICT r15 task 7's 'done' condition: the trim must leave at
    // least one demonstrated spare med slot — a fifth entry (beyond
    // the 4-cap) keeps the line under the pre-trim 1700 gate
    val line = worstCase(SparkEntry.headline, medCap = 5)
    info(s"5-med compact line: ${line.length} chars")
    // 1820 = the clean gate's 1760 plus the r15-era ~60-char med-slot
    // allowance, shifted by the r18 pw/baseline fields like the gate
    assert(line.length <= 1820,
      s"compact line with a spare med entry is ${line.length} chars — " +
        "the trim no longer leaves a free slot")
  }

  test("compact line is valid JSON with the driver-read keys") {
    val line = worstCase(SparkEntry.headline)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(line)
    for (k <- Seq("metric", "value", "unit", "queries", "anchors", "drift",
        "baseline", "sr", "med", "forced", "fdc", "skew", "pw", "sf"))
      assert(root.has(k), s"compact line lost the '$k' key")
    // r18 (VERDICT r17 task 7): the baseline chain is a first-class
    // field — round number + anchor ratio, matching drift's base/ar
    assert(root.get("baseline").get("round").asInt() === 99)
    assert(root.get("baseline").get("ar").asDouble() === 11.07)
    // r18 (task 1): base-pass (start, end) pairs — 2·Reps entries
    assert(root.get("pw").size() === 14)
    assert(root.get("queries").size() === SparkEntry.headline.size)
    assert(root.get("drift").get("dc").size() === SparkEntry.headline.size,
      "dc array must align 1:1 with the queries key order")
    assert(root.get("sr").size() === SparkEntry.headline.size,
      "sr array must align 1:1 with the queries key order")
    assert(root.get("fdc").size() === Bench.forcedQueries.size,
      "fdc array must align 1:1 with the forced key order")
    assert(root.get("skew").get("s").isNumber)
    assert(root.get("skew").get("as").isNumber)
    assert(root.get("sf").asText() === "sf0.1",
      "sf renders the dir basename only (headroom trim)")
    // med keys are index-keyed like forced (r16 headline growth): every
    // worst-case key must be a digit index or an "f:"-prefixed one
    val mIt = root.get("med").fieldNames()
    while (mIt.hasNext) {
      val k = mIt.next()
      assert(k.stripPrefix("f:").forall(_.isDigit),
        s"med key '$k' is not index-keyed — the 1600 gate depends on it")
    }
  }

  test("index-keyed forced block round-trips back to query names (r16 trim)") {
    val line = worstCase(SparkEntry.headline)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(line)
    // every forced key is an index into the queries key order...
    val qOrder = {
      val it = root.get("queries").fieldNames()
      val b = IndexedSeq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    val fIt = root.get("forced").fields()
    val fMap = Map.newBuilder[String, Double]
    while (fIt.hasNext) { val e = fIt.next(); fMap += e.getKey -> e.getValue.asDouble() }
    val forced = fMap.result()
    assert(forced.keySet.forall(k => k.forall(_.isDigit)),
      s"forced keys must be indexes on the compact line: ${forced.keySet}")
    // ...and loadBaseline's resolver maps them back to the exact
    // forcedQueries names (same path next round's drift table takes)
    val resolved = Bench.resolveIdxKeys(forced, qOrder)
    assert(resolved.keySet === Bench.forcedQueries.toSet,
      s"index resolution drifted: ${resolved.keySet}")
    // pre-r16 artifacts carry full names — those pass through untouched
    val legacy = Map("telemetry_features" -> 1.0, "events_ohlc_bars" -> 2.0)
    assert(Bench.resolveIdxKeys(legacy, qOrder) === legacy)
    // a forced query absent from the headline run falls back to its
    // full name (stays self-describing, never a dangling index)
    val missing = Bench.compactJson(1.0, Seq("q" -> Some(1.0)), Nil, None, None,
      Nil, Seq("ghost_query" -> None), None, None, None, "sf")
    assert(om.readTree(missing).get("forced").has("ghost_query"))
  }

  test("host-drift stamp: contaminated baselines are skipped (VERDICT r16 task 2)") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // the stamp renders only on contaminated rounds (zero budget clean)
    val clean = worstCase(SparkEntry.headline, hd = false)
    assert(!om.readTree(clean).has("hd"), "clean line must not carry hd")
    val stamped = Bench.compactJson(1.0, Seq("q" -> Some(1.0)), Nil,
      Some(("BENCH_r16.json", 1.95, Seq(Some(0.8)))), None, Nil, Nil,
      None, None, None, "sf0.1", hostDrift = true)
    assert(om.readTree(stamped).get("hd").asInt() === 1)
    // the worst-case line with the stamp still fits the driver window
    assert(stamped.length + (clean.length - clean.length) < 2000)

    // loadBaseline's candidate walk: the newest round is contaminated
    // (detected three ways: explicit wrapper annotation, hd stamp, or
    // a published high ar) — the last clean round wins; when ALL are
    // contaminated, the newest still wins (dc beats nothing).
    val dir = java.nio.file.Files.createTempDirectory("benchpick").toFile
    def write(name: String, body: String): java.io.File = {
      val f = new java.io.File(dir, name)
      val w = new java.io.FileWriter(f); w.write(body); w.close(); f
    }
    try {
      val r1 = write("BENCH_r01.json",
        """{"parsed":{"queries":{"q":1.0},"anchors":{"cpu":1.0},"drift":{"base":"r00","ar":0.94}}}""")
      val r2ar = write("BENCH_r02.json",
        """{"parsed":{"queries":{"q":2.0},"anchors":{"cpu":1.9},"drift":{"base":"r01","ar":1.95}}}""")
      assert(Bench.isHostDrift(r2ar), "ar 1.95 must read contaminated")
      assert(!Bench.isHostDrift(r1), "ar 0.94 must read clean")
      assert(Bench.pickCleanBaseline(Seq(r1, r2ar)).map(_.getName)
        === Some("BENCH_r01.json"))
      // explicit wrapper annotation (the retroactive r16 mark)
      val r3 = write("BENCH_r03.json",
        """{"host_drift":true,"parsed":{"queries":{"q":1.0},"anchors":{"cpu":1.0},"drift":{"base":"r01","ar":1.0}}}""")
      assert(Bench.isHostDrift(r3))
      // hd stamp on the compact line itself
      val r4 = write("BENCH_r04.json",
        """{"parsed":{"queries":{"q":1.0},"anchors":{"cpu":1.0},"hd":1,"drift":{"base":"r01","ar":1.2}}}""")
      assert(Bench.isHostDrift(r4))
      assert(Bench.pickCleanBaseline(Seq(r1, r2ar, r3, r4)).map(_.getName)
        === Some("BENCH_r01.json"))
      // a LOW ar is NOT contamination (host got faster; numbers fine)
      val r5 = write("BENCH_r05.json",
        """{"parsed":{"queries":{"q":1.0},"anchors":{"cpu":0.5},"drift":{"base":"r01","ar":0.51}}}""")
      assert(!Bench.isHostDrift(r5))
      assert(Bench.pickCleanBaseline(Seq(r1, r2ar, r3, r4, r5)).map(_.getName)
        === Some("BENCH_r05.json"))
      // all contaminated → newest anyway, never None
      assert(Bench.pickCleanBaseline(Seq(r2ar, r3)).map(_.getName)
        === Some("BENCH_r03.json"))
      // the REAL r16 artifact must read contaminated under this rule
      val real = new java.io.File("/root/repo/BENCH_r16.json")
      if (real.isFile) assert(Bench.isHostDrift(real),
        "BENCH_r16.json lost its retroactive host_drift annotation")
      val real15 = new java.io.File("/root/repo/BENCH_r15.json")
      if (real15.isFile) assert(!Bench.isHostDrift(real15),
        "BENCH_r15.json (clean round) must not read contaminated")

      // schedule-era rule (r19, VERDICT r18 task 2): once a pass-major
      // artifact ("pw" present) exists, only pass-major candidates are
      // eligible — an hd-stamped pass-major round still outranks a
      // clean consecutive-rep one (anchors correct host speed; nothing
      // corrects a schedule level shift)
      val r6pw = write("BENCH_r06.json",
        """{"parsed":{"queries":{"q":1.0},"anchors":{"cpu":2.0},"hd":1,"pw":[0.0,1.0],"drift":{"base":"r05","ar":2.1}}}""")
      assert(Bench.isPassMajor(r6pw), "pw must mark the pass-major era")
      assert(!Bench.isPassMajor(r5), "no pw → pre-pass-major")
      assert(Bench.pickCleanBaseline(Seq(r1, r5, r6pw)).map(_.getName)
        === Some("BENCH_r06.json"),
        "a stamped pass-major round must outrank every pre-era candidate")
      // ...and a CLEAN pass-major round outranks the stamped one
      val r7pw = write("BENCH_r07.json",
        """{"parsed":{"queries":{"q":1.0},"anchors":{"cpu":1.0},"pw":[0.0,1.0],"drift":{"base":"r06","ar":0.5}}}""")
      assert(Bench.pickCleanBaseline(Seq(r1, r5, r6pw, r7pw)).map(_.getName)
        === Some("BENCH_r07.json"))
      // the REAL artifacts: r18 is the first pass-major round and must
      // be the pick over clean-but-consecutive-rep r15
      val real18 = new java.io.File("/root/repo/BENCH_r18.json")
      if (real18.isFile) {
        assert(Bench.isPassMajor(real18), "BENCH_r18.json lost its pw field")
        if (real15.isFile)
          assert(Bench.pickCleanBaseline(Seq(real15, real18)).map(_.getName)
            === Some("BENCH_r18.json"),
            "r19+ must baseline against the pass-major chain, not r15")
      }
    } finally {
      Option(dir.listFiles()).toSeq.flatten.foreach(_.delete()); dir.delete()
    }
  }

  test("pass-major schedule separates every query's draws (VERDICT r17 task 1)") {
    val qs = (1 to 29).map(i => s"q$i")
    val sched = Bench.passMajor(qs, 7)
    assert(sched.size === 29 * 7)
    // consecutive draws of the same query are exactly one full suite
    // apart — the separation that makes a contention window unable to
    // cover every draw of any query
    for (q <- qs) {
      val idxs = sched.zipWithIndex.collect { case ((_, n), i) if n == q => i }
      assert(idxs.size === 7)
      assert(idxs.sliding(2).forall { case Seq(a, b) => b - a == qs.size })
    }
    // each pass runs every query exactly once, in suite order
    for (p <- 1 to 7)
      assert(sched.filter(_._1 == p).map(_._2) === qs)
  }

  test("simulated slow pass: published min survives a poisoned pass (r17 task 1)") {
    // the official r17 failure, reconstructed: a sustained contention
    // window multiplied every draw inside it ×6–50, and because the old
    // schedule ran all 7 reps of a query consecutively, the covered
    // queries had NO clean draw (median≈min at ×50). Under pass-major,
    // a window poisons whole PASSES; simulate every choice of one
    // poisoned pass and assert each query's min stays its clean cost.
    val qs = (1 to 13).map(i => s"q$i")
    val clean: Map[String, Double] = qs.zipWithIndex.map {
      case (q, i) => q -> (0.1 + i * 0.03)
    }.toMap
    for (poisoned <- 1 to 7; q <- qs) {
      val draws = (1 to 7).map(p =>
        p -> clean(q) * (if (p == poisoned) 50.0 else 1.0))
      assert(Bench.minAcrossPasses(draws) === Some(clean(q)),
        s"min poisoned by pass $poisoned for $q")
    }
    // even a window covering 6 of 7 passes leaves the min clean as long
    // as ONE pass escaped — the structural guarantee the r17 artifact's
    // consecutive reps lacked
    val draws = (1 to 7).map(p => p -> (if (p == 4) 1.0 else 50.0))
    assert(Bench.minAcrossPasses(draws) === Some(1.0))
    assert(Bench.minAcrossPasses(Nil) === None)
  }

  test("compact line renders null-side skew and absent drift without keys lost") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // amp alive with base dead — the ADVICE r13 case: the amp block
    // must survive a failed base probe
    val ampOnly = Bench.compactJson(1.0, Seq("q" -> Some(1.0)), Nil, None,
      None, Nil, Nil, None, None, Some((2.0, 1.0)), "sf")
    val r1 = om.readTree(ampOnly)
    assert(r1.get("skew").get("s").isNull)
    assert(r1.get("skew").get("as").asDouble() === 2.0)
    // both probes dead → skew is null, line still parses
    val none = Bench.compactJson(1.0, Seq("q" -> None), Nil, None,
      None, Nil, Nil, None, None, None, "sf")
    val r2 = om.readTree(none)
    assert(r2.get("skew").isNull)
    assert(r2.get("queries").get("q").asInt() === -1)
  }

  test("effectiveAr compounds through contaminated baselines; bea publishes the evidence (r20)") {
    // the r19/r18 laundering case in miniature: r02 is hd-stamped at
    // ar 2.0 vs clean r01; r03 publishes ar 1.2 vs r02 and reads clean
    // one-hop — its EFFECTIVE anchors vs the clean chain end are 2.4.
    val dir = java.nio.file.Files.createTempDirectory("graft_bea").toFile
    def art(n: Int, base: Int, ar: Double, hd: Boolean): java.io.File = {
      val f = new java.io.File(dir, f"BENCH_r$n%02d.json")
      val hdJson = if (hd) s""""hd":1,""" else ""
      // f-interpolator: under s"" the %02d is literal and the base
      // lands as "r4%02d" — the walker's lenient regex happened to
      // still extract the digits, leaving the pin one regex-tightening
      // away from vacuous (review r20)
      java.nio.file.Files.write(f.toPath,
        f"""{"metric":"total","value":1.0,"queries":{"q":1.0},$hdJson
           |"drift":{"base":"r$base%02d","ar":$ar,"dc":[1.0]}}"""
          .stripMargin.replace("\n", "").getBytes("UTF-8"))
      f
    }
    try {
      val r1 = art(1, 0, 0.9, hd = false)  // chain end (r00 absent → clean)
      val r2 = art(2, 1, 2.0, hd = true)
      val r3 = art(3, 2, 1.2, hd = false)
      assert(Bench.effectiveAr(r1).exists(v => math.abs(v - 0.9) < 1e-9))
      assert(Bench.effectiveAr(r2).exists(v => math.abs(v - 2.0) < 1e-9))
      assert(Bench.effectiveAr(r3).exists(v => math.abs(v - 2.4) < 1e-9),
        s"r03 must compound 1.2 x 2.0 through the stamped r02: " +
          s"${Bench.effectiveAr(r3)}")
      // DIAGNOSTIC only: the one-hop stamp rule is unchanged — r03
      // still reads clean (hosts legitimately change speed; the
      // evidence ships on the line instead, see effectiveAr's scaladoc)
      assert(!Bench.isHostDrift(r3) && Bench.isHostDrift(r2))
      // ...and the compact line renders the evidence inside "baseline"
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val line = Bench.compactJson(1.0, Seq("q" -> Some(1.0)), Nil,
        Some(("BENCH_r03.json", 0.54, Seq(Some(1.38)))), None, Nil, Nil,
        None, None, None, "sf0.1", baselineEffAr = Some(2.4))
      val bl = om.readTree(line).get("baseline")
      assert(bl.get("round").asInt === 3 && bl.get("bea").asDouble === 2.4, line)
      val without = Bench.compactJson(1.0, Seq("q" -> Some(1.0)), Nil,
        Some(("BENCH_r03.json", 0.54, Seq(Some(1.38)))), None, Nil, Nil,
        None, None, None, "sf0.1")
      assert(!om.readTree(without).get("baseline").has("bea"),
        "bea must spend zero line budget when the chain is clean")
    } finally Bench.deleteRecursively(dir.toString)
  }

  test("effectiveAr honors the retroactive top-level host_drift stamp (r20)") {
    // the OTHER stamp spelling: a round adjudicated loaded AFTER its
    // artifact shipped carries "host_drift": true at the TOP level,
    // wrapping a clean parsed block (BENCH_r16.json's real shape) —
    // the chain walker must compound through it exactly like an
    // in-line "hd" stamp, or the Scala publisher and the Python
    // mirror disagree about the same chain.
    val dir = java.nio.file.Files.createTempDirectory("graft_bea_hd").toFile
    def art(n: Int, base: Int, ar: Double, topStamp: Boolean): java.io.File = {
      val f = new java.io.File(dir, f"BENCH_r$n%02d.json")
      val parsed =
        f"""{"metric":"total","value":1.0,"queries":{"q":1.0},
           |"drift":{"base":"r$base%02d","ar":$ar,"dc":[1.0]}}"""
          .stripMargin.replace("\n", "")
      val doc =
        if (topStamp) s"""{"host_drift":true,"parsed":$parsed}""" else parsed
      java.nio.file.Files.write(f.toPath, doc.getBytes("UTF-8"))
      f
    }
    try {
      art(4, 3, 1.5, topStamp = true) // r03 absent → chain end
      val r5 = art(5, 4, 1.1, topStamp = false)
      assert(Bench.isHostDrift(new java.io.File(dir, "BENCH_r04.json")),
        "fixture: the top-level stamp must read as host drift")
      assert(Bench.effectiveAr(r5).exists(v => math.abs(v - 1.65) < 1e-9),
        s"r05 must compound 1.1 x 1.5 through the top-level-stamped r04: " +
          s"${Bench.effectiveAr(r5)}")
    } finally Bench.deleteRecursively(dir.toString)
  }
}
