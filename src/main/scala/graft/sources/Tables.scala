package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet star schema (TESTDATA.md) plus
  * generic table registration helpers mirroring the reference's
  * `register_parquet` / `register_csv` surface
  * (reference `examples/dataframe/query.rs:118-123`,
  * `examples/algo/one_billion_row_challenge.rs:122-123`).
  *
  * All loads are lazy parquet scans — Catalyst pushes filters and prunes
  * columns into the scan, which is what keeps these viable at 100 TB.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Lazy scan of one table under a scale-factor directory.
    *
    * `events.ts` has been generated under two different physical parquet
    * encodings over time, so the loader adapts to the schema it actually
    * reads instead of hard-coding one (the reference pins its expected
    * schema at read the same way, `src/utils/datasets.rs:40-52`):
    *
    *   - legacy TIMESTAMP(NANOS): Spark has no native nanos type; with
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (kept in
    *     [[graft.core.Sessions]] for backward compat) the column arrives as
    *     LongType and is rebuilt as a microsecond TimestampType
    *     (ns→µs truncation, SURVEY.md §1.2);
    *   - current timestamp[us] with isAdjustedToUTC=false: arrives as
    *     TIMESTAMP_NTZ; cast to TimestampType — the session timezone is
    *     pinned to UTC so the micros are bit-identical to the naive value
    *     the DuckDB oracle computes;
    *   - timestamp[us] UTC-adjusted: already TimestampType, pass through.
    *
    * Every downstream consumer (as-of joins, sessionize, 1BRC, hourly aggs,
    * streaming twins) sees one normalized contract: `ts: TimestampType, µs
    * precision, UTC` regardless of the file encoding. TablesSchemaSpec is
    * the canary that asserts this across all scale factors.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Normalize `ts` to µs TimestampType whatever its physical encoding. */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported physical type $other — expected nanos-as-long, timestamp_ntz, or timestamp")
    }
  }

  /** Register every table as a temp view for SQL access (S5 analogue). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** S1: CSV scan with header + schema inference
    * (reference `src/utils/datasets.rs:54-56`). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S2: headerless CSV scan; DataFusion names the single column
    * `column_1`, Spark `_c0` — normalize to the reference's names
    * (reference `examples/algo/one_billion_row_challenge.rs:121-123`). */
  def csvNoHeader(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.option("header", "false").csv(path)
    df.toDF(df.columns.indices.map(i => s"column_${i + 1}"): _*)
  }

  /** S4: parquet scan (reference `tests/api/dataframe_tests.rs:593-595`). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSONL scan with a MANDATORY explicit schema — the ingest reader for
    * line-delimited corpora ([[graft.sinks.Sinks.writeJsonl]] is the
    * writing half). Explicit schema is a 100 TB design decision, not a
    * convenience default: schema inference on JSON is a FULL extra pass
    * over the data before the real scan, and worse, the inferred types
    * drift with content (a batch whose `id`s all fit in int infers a
    * narrower type than yesterday's batch — silent downstream breakage).
    * JSONL stays splittable (object-per-line ⇒ files chunk at line
    * boundaries), unlike a multiline JSON array which forces
    * one-task-per-file parsing. */
  def jsonl(spark: SparkSession, path: String,
            schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
