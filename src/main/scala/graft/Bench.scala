package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the configured
  * scale factor and prints ONE JSON line.
  *
  * Hygiene rules (without which per-query numbers are meaningless):
  *  - a warm-up pass touches every table and the codegen/JIT machinery so
  *    the first measured query doesn't absorb one-time session cost;
  *  - `spark.catalog.clearCache()` runs between queries — several dedup
  *    operators cache intermediate frames (signatures, shingles) for the
  *    duration of their own plan, and leaked cache blocks otherwise evict
  *    each other and inflate later queries 10-40x;
  *  - each query is timed min-of-N (N=3 by default, SPARK_GRAFT_BENCH_RUNS
  *    to override): min filters out GC/compile noise, which at sub-second
  *    query times is the dominant variance source (observed ±2x run-to-run
  *    on multi-stage queries at N=1);
  *  - the JSON line records cpus + sf so a number is never quoted without
  *    the environment that produced it;
  *  - a query that throws is recorded as `"err"` (message, not a time) —
  *    a silent catch would report a failure as a fast success and corrupt
  *    the perf signal.
  *
  * Output contract (learned the hard way — BENCH_r01..r03 all came back
  * `parsed: null`): the harness that invokes this main captures only the
  * LAST ~2000 characters of stdout and parses the JSON line it finds
  * there. A full 94-query map at nanosecond precision is ~3 kB and
  * overflows that window, so the printed line is COMPACT: millisecond
  * precision, a curated headline-query map, family totals for the rest.
  * [[renderCompact]] is unit-tested to stay under the window. The full
  * map at full precision is always written to `bench_out.json`.
  */
object Bench {

  /** Queries whose individual times go on the printed line: the heaviest
    * and most perf-design-load-bearing one or two per operator family.
    * Everything else is rolled up into per-prefix family totals (still on
    * the line) and fully itemised in bench_out.json.
    */
  val headline: Seq[String] = Seq(
    "dd_clusters", "dd_survivors_exact", "dd_minhash_pairs",
    "dd_ngram_pairs", "dd_simhash_pairs", "dd_embed_lsh", "dd_embed_pairs",
    "dd_exact", "dd_spans",
    "ds_pack", "ds_mix",
    "ev_asof", "ev_sessionize",
    "mm_features",
    "q1_agg", "q_1brc_fast", "q_join_inner", "q_join_multikey",
    "q_star_join", "q_salted_join", "q_range_join", "q_events_hourly",
    "sim_kmeans", "sim_recall", "sim_topk", "sim_topk_ivf", "sim_topk_lsh",
    "sim_topk_q8",
    "txt_hash_topk", "txt_tfidf", "txt_bm25", "txt_tokens",
    "x_cte_exists", "x_cube", "x_intersect", "x_rank_window",
  )

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""

  private def f3(d: Double): String = f"$d%.3f"

  /** The compact line printed to stdout. Pure function of the results so a
    * spec can pin its length below the harness's stdout-tail window.
    */
  def renderCompact(results: Seq[(String, Double, Option[String])],
                    sfDir: String, cpus: String, runs: Int): String = {
    val byName = results.map(r => r._1 -> r).toMap
    val shown = headline.filter(byName.contains)
    val shownSet = shown.toSet
    val qs = shown.map { name =>
      val (_, t, err) = byName(name)
      jstr(name) + ":" + err.fold(f3(t))(m => jstr(m.take(60)))
    }.mkString("{", ",", "}")
    // family rollup over the non-headline remainder, keyed by name prefix
    val fams = results.filterNot(r => shownSet.contains(r._1))
      .groupBy(_._1.takeWhile(_ != '_'))
      .toSeq.sortBy(_._1)
      .map { case (fam, rs) => jstr(fam) + ":" + f3(rs.map(_._2).sum) }
      .mkString("{", ",", "}")
    val nErr = results.count(_._3.isDefined)
    val total = results.collect { case (_, t, None) => t }.sum
    s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"other_families":$fams,"n_queries":${results.size},"sf":"$sfDir","cpus":$cpus,"runs":$runs,"timing":"min_of_runs","n_err":$nErr,"full":"bench_out.json"}"""
  }

  /** Full-precision, every-query line written to bench_out.json. */
  def renderFull(results: Seq[(String, Double, Option[String])],
                 sfDir: String, cpus: String, runs: Int): String = {
    val qs = results.map { case (name, t, err) =>
      jstr(name) + ":" + err.fold(t.toString)(m => jstr(m))
    }.mkString("{", ",", "}")
    val nErr = results.count(_._3.isDefined)
    val total = results.collect { case (_, t, None) => t }.sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"runs":$runs,"timing":"min_of_runs","n_err":$nErr}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // local-dev focus filter: comma-separated query names; unset = all
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: touch every table + exercise agg/join/codegen paths once
    try {
      graft.sources.Tables.all.foreach { t =>
        graft.sources.Tables.load(spark, sfDir, t).limit(1).count()
      }
      SparkEntry.queries.get("q1_agg").foreach(_(spark, sfDir).count())
      SparkEntry.queries.get("q_join_inner").foreach(_(spark, sfDir).count())
      spark.catalog.clearCache()
    } catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        var err: Option[String] = None
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch {
            case e: Throwable =>
              err = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
          val dt = (System.nanoTime() - t0) / 1e9
          // drop any cache an operator built for this plan before the next
          // query (or the next run) is timed
          spark.catalog.clearCache()
          dt
        }
        (name, times.min, err)
      }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"),
      renderFull(results, sfDir, cpus, runs) + "\n")
    // printed LAST so it lands inside the harness's stdout-tail window
    println(renderCompact(results, sfDir, cpus, runs))
    spark.stop()
  }
}
