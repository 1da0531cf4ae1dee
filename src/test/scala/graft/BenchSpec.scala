package graft

import java.util.Locale

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Bench harness plumbing: JSON rendering that survives hostile locales,
  * the child-JVM TSV result protocol, and fork preconditions. The round-5
  * verdict showed the bench ARTIFACT can invalidate a whole round of perf
  * conclusions, so its machinery is spec'd like an operator. */
class BenchSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  test("compact line is locale-proof: comma-decimal locale still emits JSON") {
    val dflt = Locale.getDefault
    try {
      Locale.setDefault(Locale.FRANCE) // 1,235 instead of 1.235 if naive
      val line = Bench.renderCompact(
        Seq(Bench.QTime("q1_agg", 1.23456, 1.3, None),
          Bench.QTime("zz_other", 2.0, 2.0, None)),
        "sf", "4", 1)
      val tree = mapper.readTree(line) // throws on 1,235
      assert(math.abs(tree.get("value").asDouble() - 3.235) < 1e-9)
      assert(math.abs(tree.get("queries").get("q1_agg").asDouble()
        - 1.235) < 1e-9)
    } finally Locale.setDefault(dflt)
  }

  test("full line is locale-proof and parseable too") {
    val dflt = Locale.getDefault
    try {
      Locale.setDefault(Locale.GERMANY)
      val line = Bench.renderFull(
        Seq(Bench.QTime("a_q", 0.123456789, 0.2, None),
          Bench.QTime("b_q", 1.0, 1.0, Some("boom"))),
        "sf", "32", 3)
      val tree = mapper.readTree(line)
      assert(tree.get("queries").get("a_q").asDouble() > 0.123)
      assert(tree.get("queries").get("b_q").asText() == "boom")
      assert(tree.get("n_err").asInt() == 1)
    } finally Locale.setDefault(dflt)
  }

  test("compact line records the execution mode and the full-dump path") {
    val line = Bench.renderCompact(
      Seq(Bench.QTime("q1_agg", 1.0, 1.0, None)), "sf", "4",
      1, mode = "fork_per_family", outPath = "custom_out.json")
    val tree = mapper.readTree(line)
    assert(tree.get("mode").asText() == "fork_per_family")
    assert(tree.get("full").asText() == "custom_out.json")
  }

  test("TSV child protocol round-trips, sanitizing tabs/newlines in errors") {
    val results = Seq(
      Bench.QTime("q_ok", 1.5, 1.8, None),
      Bench.QTime("q_err", 0.25, 0.25,
        Some("Spark\tException:\nline1\rline2")))
    val parsed = Bench.parseTsv(Bench.renderTsv(results))
    assert(parsed.map(r => (r.name, r.secs, r.maxSecs)) ==
      Seq(("q_ok", 1.5, 1.8), ("q_err", 0.25, 0.25)))
    assert(parsed(0).err.isEmpty)
    assert(parsed(1).err.contains("Spark Exception: line1 line2"))
  }

  test("malformed TSV fails loudly instead of merging garbage") {
    intercept[IllegalArgumentException] {
      Bench.parseTsv("q_torn\t1.5\t1.6\n") // missing error column
    }
  }

  test("fork classpath is reconstructible in this environment") {
    // the forked-bench design depends on rebuilding a child classpath
    // from the classloader chain / java.class.path; if this ever comes
    // back empty the bench silently degrades to shared-session numbers —
    // surface that here instead
    val cp = Bench.forkClasspath()
    assert(cp.nonEmpty)
    val entries = cp.split(java.io.File.pathSeparator)
    assert(entries.exists(e => e.contains("classes") || e.endsWith(".jar")),
      s"suspicious classpath: ${entries.take(5).mkString(";")}")
  }

  test("childJvmArgs normalizes pair-style --add-opens and keeps heap flags") {
    val args = Bench.childJvmArgs(Seq(
      "--add-opens", "java.base/java.lang=ALL-UNNAMED", // sbt pair style
      "--add-opens=java.base/java.nio=ALL-UNNAMED",     // = style
      "-Xmx8g", "-Dspark.ui.enabled=false", "-javaagent:x.jar"))
    // pair form is normalized to one flag=value token (a dangling
    // --add-opens kills the JVM; a separate-token pair is distinct-fragile)
    assert(args.contains("--add-opens=java.base/java.lang=ALL-UNNAMED"))
    assert(!args.contains("--add-opens"))
    assert(args.contains("--add-opens=java.base/java.nio=ALL-UNNAMED"))
    assert(args.contains("-Xmx8g"))
    // unrelated -D / agent flags are not propagated
    assert(!args.exists(_.startsWith("-D")))
    assert(!args.exists(_.startsWith("-javaagent")))
    // the Spark JDK-17 module set is always present
    assert(args.exists(_.contains("sun.nio.ch=ALL-UNNAMED")))
  }

  test("two separate-token --add-opens pairs both survive the dedup") {
    // regression: distinct on the flat argv used to collapse the repeated
    // `--add-opens` token, leaving the second module value as a bare arg
    // the child java launcher parsed as the MAIN CLASS — every child died
    // and the bench silently fell back to shared-session numbers
    val args = Bench.childJvmArgs(Seq(
      "--add-opens", "java.base/java.lang=ALL-UNNAMED",
      "--add-opens", "java.base/java.util=ALL-UNNAMED"))
    assert(args.contains("--add-opens=java.base/java.lang=ALL-UNNAMED"))
    assert(args.contains("--add-opens=java.base/java.util=ALL-UNNAMED"))
    // nothing dangling: every surviving token is flag-shaped
    assert(args.forall(a => a.startsWith("-")))
  }

  test("full render carries the [min,max] spread per successful entry") {
    val line = Bench.renderFull(
      Seq(Bench.QTime("a_q", 1.5, 1.9, None),
        Bench.QTime("b_q", 1.0, 1.0, Some("boom"))),
      "sf", "32", 3)
    val tree = mapper.readTree(line)
    val sp = tree.get("spread")
    assert(sp.get("a_q").get(0).asDouble() == 1.5)
    assert(sp.get("a_q").get(1).asDouble() == 1.9)
    // an errored entry has no meaningful spread
    assert(sp.get("b_q") == null)
  }

  test("crossovers field is stamped only when a cohort actually ran") {
    // two contenders of one cohort present -> the interleaved
    // methodology ran and the artifact says so
    val cohortRun = Bench.renderFull(
      Seq(Bench.QTime("bench_dd12k_ngram", 3.0, 3.2, None),
        Bench.QTime("bench_dd12k_minhash", 2.8, 2.9, None)),
      "sf", "32", 3)
    assert(mapper.readTree(cohortRun)
      .get("crossovers").asText() == "interleaved")
    // a lone cohort member (BENCH_ONLY slice) or non-cohort queries ran
    // plain sequential min-of-N — stamping "interleaved" would describe
    // a methodology that never ran
    val solo = Bench.renderFull(
      Seq(Bench.QTime("bench_dd12k_ngram", 3.0, 3.2, None),
        Bench.QTime("q1_agg", 1.0, 1.0, None)),
      "sf", "32", 3)
    assert(mapper.readTree(solo).get("crossovers") == null)
  }

  test("fast-runs fields describe only a methodology that actually ran") {
    // the sub-0.5s top-up to min-of-5 fires only when runs < 5 AND some
    // timed entry sits under the cutoff — with runs >= 5, or a slice
    // where every entry is slow (or the fast one errored), the fields
    // would describe a regime that never applied
    val topped = Bench.renderCompact(
      Seq(Bench.QTime("q1_agg", 0.2, 0.3, None)), "sf", "4", 3)
    assert(topped.contains("\"runs_fast\":5"))
    val allSlow = Bench.renderCompact(
      Seq(Bench.QTime("q1_agg", 1.0, 1.0, None)), "sf", "4", 3)
    assert(!allSlow.contains("runs_fast"))
    val fastButErred = Bench.renderCompact(
      Seq(Bench.QTime("q1_agg", 0.0, 0.0, Some("boom"))), "sf", "4", 3)
    assert(!fastButErred.contains("runs_fast"))
    val flat = Bench.renderCompact(
      Seq(Bench.QTime("q1_agg", 0.2, 0.3, None)), "sf", "4", 5)
    assert(!flat.contains("runs_fast"))
    assert(mapper.readTree(flat).get("runs").asInt() == 5)
  }

  test("both artifact forms declare the timing-methodology baseline break") {
    // r7->r8 minima diverged ~2x on untouched queries purely from the
    // interleaving change; the artifact must self-describe that pre-r9
    // numbers are a different regime rather than let a reader diff them
    val compact = mapper.readTree(Bench.renderCompact(
      Seq(Bench.QTime("q1_agg", 1.0, 1.0, None)), "sf", "4", 3))
    val full = mapper.readTree(Bench.renderFull(
      Seq(Bench.QTime("q1_agg", 1.0, 1.0, None)), "sf", "4", 3))
    for (tree <- Seq(compact, full)) {
      val brk = tree.get("baseline_break")
      assert(brk != null && brk.asText().contains("warmup"))
    }
  }

  test("crossover cohorts name real bench entries, each in one cohort") {
    val all = Bench.crossoverCohorts.flatten
    assert(all.distinct == all, "a query may belong to only one cohort")
    assert(all.toSet.subsetOf(Bench.allBenchQueries.keySet),
      "cohorts must reference existing queries — a rename here silently " +
        "de-interleaves the rig")
    // every cohort is a real A/B comparison
    assert(Bench.crossoverCohorts.forall(_.size >= 2))
    // interleaving happens inside ONE child JVM, and children are cut by
    // name-prefix family — a cohort spanning families would silently run
    // its members in different processes, never interleaved
    assert(Bench.crossoverCohorts.forall(c =>
      c.map(_.takeWhile(_ != '_')).distinct.size == 1),
      "cohort members must share a fork family")
  }

  test("claims: computed conclusions land in the artifact, flips counted") {
    // every claim operand is a real timeable entry — a rename here would
    // silently drop the claim from the artifact (omitted, not false)
    val ops = Bench.claimSpecs.flatMap { case (_, l, r, _) => Seq(l, r) }
    assert(ops.toSet.subsetOf(Bench.allBenchQueries.keySet))
    val names = Bench.claimSpecs.map(_._1)
    assert(names.distinct == names)

    def qt(n: String, s: Double) = Bench.QTime(n, s, s, None)
    // a holding claim and a flipped one
    val r = Seq(qt("bench_dd50k_ngram_pruned", 10.0),
      qt("bench_dd50k_ngram", 20.0),
      qt("bench_lsh50k_lsh", 2.0), qt("bench_lsh50k_brute", 1.0))
    // compact line: evaluated count + failed names only (stdout-tail
    // budget); the boolean-per-claim map is the full render's job
    val json = mapper.readTree(
      Bench.renderCompact(r, "sf", "4", 3))
    assert(json.get("n_claims").asInt() == 2)
    assert(json.get("claims_failed").size() == 1)
    assert(json.get("claims_failed").get(0).asText() == "lsh_beats_brute_50k")
    val full = mapper.readTree(Bench.renderFull(r, "sf", "4", 3))
    assert(full.get("claims").get("prune_beats_naive_dd50k").asBoolean())
    assert(!full.get("claims").get("lsh_beats_brute_50k").asBoolean())
    assert(full.get("n_claims_failed").asInt() == 1)
    // factor-based claim: skew within 2x of uniform
    val skew = mapper.readTree(Bench.renderFull(
      Seq(qt("bench_cc2m_skew", 30.7), qt("bench_cc2m_dist", 22.7)),
      "sf", "4", 3))
    assert(skew.get("claims").get("cc_skew_within_2x").asBoolean())
    assert(skew.get("n_claims_failed").asInt() == 0)
    // missing or errored operands: claim omitted entirely, never guessed
    val errd = Seq(qt("bench_dd50k_ngram_pruned", 10.0),
      Bench.QTime("bench_dd50k_ngram", 0.0, 0.0, Some("boom")))
    val gone = mapper.readTree(Bench.renderCompact(errd, "sf", "4", 3))
    assert(gone.get("n_claims") == null && gone.get("claims_failed") == null)
    val goneFull = mapper.readTree(Bench.renderFull(errd, "sf", "4", 3))
    assert(goneFull.get("claims") == null &&
      goneFull.get("n_claims_failed") == null)
  }

  test("bench-only extras exist and are disjoint from the driver contract") {
    val extras = Bench.extraQueries.keySet
    assert(extras == Set(
      // ANN crossover rig: 4 contenders + recall guard
      "bench_lsh50k_brute", "bench_lsh50k_lsh", "bench_lsh50k_ivf",
      "bench_lsh50k_q8", "bench_lsh50k_recall",
      // CC crossover rig: driver vs distributed + equality/round guard,
      // plus the star-heavy skew twin of the 2M-edge graph
      "bench_cc450k_driver", "bench_cc450k_dist", "bench_cc2m_dist",
      "bench_cc2m_skew", "bench_cc_guard",
      // dedup crossover rig: naive/pruned exact vs minhash + recall
      // guard, plus quarter-size twins for the scaling-exponent ratio
      "bench_dd50k_ngram", "bench_dd50k_ngram_pruned",
      "bench_dd50k_minhash", "bench_dd50k_recall",
      "bench_dd12k_ngram", "bench_dd12k_minhash",
      // incremental dedup crossover: inline corpus recompute vs the
      // contract query's materialized-index probe path
      "bench_ddinc_inline", "bench_ddinc_probe"))
    assert(extras.intersect(SparkEntry.queries.keySet).isEmpty)
    // extras must NOT leak into Verify/oracle accounting
    assert(extras.intersect(SparkEntry.oracleSql.keySet).isEmpty)
  }
}
