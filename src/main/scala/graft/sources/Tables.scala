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
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark has no
    * native type for; sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[graft.core.Sessions]])
    * and this loader rebuilds a microsecond TimestampType column from the
    * raw nanos (ns→µs truncation, documented in SURVEY.md §1.2).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
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
}
