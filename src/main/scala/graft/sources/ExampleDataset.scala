package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.core.EngineError.IoError

/** The reference's example-dataset layer (reference
  * `src/utils/datasets.rs:28-120`): a named dataset with a fixed schema, a
  * loader, and a CSV→Parquet materializer.
  */
sealed trait ExampleDataset {
  def path: String
  def schema: StructType
  def load(spark: SparkSession): DataFrame
}

object ExampleDataset {

  /** The cars CSV: 25 rows, 2 car groups (fixture `data/csv/cars.csv`;
    * reference schema `src/utils/datasets.rs:40-52`). Timestamps are
    * whole-second, so Arrow's ns precision survives Spark's µs
    * TimestampNTZ losslessly (SURVEY §7.3).
    */
  case object Cars extends ExampleDataset {
    val path = "data/csv/cars.csv"
    val schema: StructType = StructType(Seq(
      StructField("car", StringType, nullable = false),
      StructField("speed", DoubleType, nullable = false),
      StructField("time", TimestampNTZType, nullable = false)))

    def load(spark: SparkSession): DataFrame =
      spark.read.option("header", "true").schema(schema).csv(path)
  }

  /** S20: CSV→Parquet materializer in a temp dir — reference
    * `write_csv_to_parquet` (`src/utils/datasets.rs:60-120`). The missing-
    * file message is part of the reference contract
    * (`src/utils/datasets.rs:227-244`). */
  def csvToParquet(spark: SparkSession, csvPath: String): Path = {
    if (!Files.exists(Paths.get(csvPath)))
      throw IoError(s"CSV file does not exist: $csvPath")
    val out = Files.createTempDirectory("graft_parquet_")
    val target = out.resolve("data.parquet")
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(csvPath)
      .write.mode("overwrite").parquet(target.toString)
    target
  }
}
