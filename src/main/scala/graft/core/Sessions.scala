package graft.core

import org.apache.spark.sql.SparkSession

/** Session construction, mirroring the reference's `SessionContext` role
  * (cf. reference `src/utils/dataframe.rs:291`, `examples/dataframe/query.rs:39`):
  * one object holding catalog + config + runtime.
  *
  * Scale notes: shuffle partitions default to the local core count here, but
  * on a real cluster callers should size `spark.sql.shuffle.partitions` to
  * ~2-3x total executor cores; AQE (enabled) coalesces and re-plans at
  * runtime, which is the 100-TB-safe default.
  */
object Sessions {

  /** Default parallelism for local runs; a cluster deployment overrides via
    * --conf. Kept small locally so sf<=0.1 tests don't spray 200 tiny tasks.
    */
  def localCores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    Runtime.getRuntime.availableProcessors().toString).toInt

  /** Build the standard session. UTC timezone pinned for deterministic
    * timestamp semantics (the reference's Arrow timestamps are TZ-free).
    */
  def build(appName: String = "graft",
            master: Option[String] = None,
            shufflePartitions: Option[Int] = None): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(localCores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // stable parquet timestamps for cross-engine (duckdb/pyarrow) readers
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // testdata events.ts is TIMESTAMP(NANOS); read raw nanos as long and
      // let Tables.load rebuild a microsecond timestamp
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val withMaster = master.fold(b)(m => b.master(m))
    val spark = withMaster.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Local session for tests / examples. */
  def local(appName: String = "graft-local"): SparkSession =
    build(appName, master = Some(s"local[$localCores]"))
}
