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
  *    the perf signal;
  *  - the line is also written to `bench_out.json` so the artifact
  *    survives stdout truncation.
  */
object Bench {
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

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

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
    val qs = results.map { case (name, t, err) =>
      jstr(name) + ":" + err.fold(t.toString)(m => jstr(m))
    }.mkString("{", ",", "}")
    val nErr = results.count(_._3.isDefined)
    val total = results.collect { case (_, t, None) => t }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"runs":$runs,"timing":"min_of_runs","n_err":$nErr}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"),
      line + "\n")
    spark.stop()
  }
}
