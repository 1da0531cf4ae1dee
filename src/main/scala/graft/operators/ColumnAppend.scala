package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.EngineError.AnalysisError

/** H1: positional column append — the one operator family with no lazy
  * Spark equivalent (reference `add_column_to_df`,
  * `src/utils/dataframe.rs:572-597`; `add_columns_to_df` `:634-665`;
  * `add_pk_to_df` `src/utils/helpers.rs:161-185`).
  *
  * Semantics: append a host-provided value vector to the frame *by row
  * position* in the frame's current plan-output order. Like the reference,
  * this is deliberately eager (the reference collects all batches
  * host-side); the values themselves originate on the driver, so the only
  * distributed concern is not collecting the *frame*: we zip per-partition
  * via `rdd.zipWithIndex` (one extra job to count partitions, no shuffle)
  * and ship the value vector as a broadcast.
  *
  * Ordering caveat (same as the reference, SURVEY §7.4): row order is the
  * plan's output order; pin it with a sort upstream if it matters.
  */
object ColumnAppend {

  /** Append several columns positionally in one pass.
    * Error messages are part of the reference contract
    * (reference `src/utils/dataframe.rs:580-591`):
    * "Empty DataFrame" / "Column 'x' has length n, expected m".
    */
  def addColumns(df: DataFrame,
                 cols: Seq[(String, Seq[Any], DataType)]): DataFrame = {
    val spark = df.sparkSession
    if (df.columns.isEmpty || df.isEmpty) throw AnalysisError("Empty DataFrame")
    val n = df.count()
    cols.foreach { case (name, values, _) =>
      if (values.length != n)
        throw AnalysisError(
          s"Column '$name' has length ${values.length}, expected $n")
    }
    val bcast = spark.sparkContext.broadcast(cols.map(_._2.toIndexedSeq))
    val appended = df.rdd.zipWithIndex().map { case (row, idx) =>
      val extra = bcast.value.map(v => v(idx.toInt))
      Row.fromSeq(row.toSeq ++ extra)
    }
    val schema = StructType(df.schema.fields ++
      cols.map { case (name, _, dt) => StructField(name, dt, nullable = true) })
    spark.createDataFrame(appended, schema)
  }

  /** C4: single-column positional append. */
  def addColumn(df: DataFrame, name: String, values: Seq[Any],
                dataType: DataType): DataFrame =
    addColumns(df, Seq((name, values, dataType)))

  /** C7/C8: typed conveniences over the generic mechanism. */
  def addIntColumn(df: DataFrame, name: String, values: Seq[Int]): DataFrame =
    addColumn(df, name, values, IntegerType)

  def addStrColumn(df: DataFrame, name: String, values: Seq[String]): DataFrame =
    addColumn(df, name, values, StringType)

  /** C6: `add_pk_to_df` — sequential Int32 0..n-1 primary key in current
    * row order, non-nullable (reference `src/utils/helpers.rs:161-185`).
    * `monotonically_increasing_id` is NOT sequential across partitions, so
    * this uses `zipWithIndex` (contiguous, no shuffle).
    */
  def addPk(df: DataFrame, name: String = "pk"): DataFrame = {
    val spark = df.sparkSession
    if (df.columns.isEmpty) throw AnalysisError("Empty DataFrame")
    val withPk = df.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx.toInt)
    }
    val schema = StructType(df.schema.fields :+
      StructField(name, IntegerType, nullable = false))
    spark.createDataFrame(withPk, schema)
  }

  /** C9: `add_col_arr_to_df` — runtime-typed append with the reference's
    * supported-type set; anything else is unsupported
    * (reference `src/utils/helpers.rs:425-472`, `unimplemented!` branch).
    */
  def addAnyColumn(df: DataFrame, name: String, values: Seq[Any],
                   dataType: DataType): DataFrame = dataType match {
    case StringType | IntegerType | LongType | FloatType | DoubleType |
         BinaryType | BooleanType =>
      addColumn(df, name, values, dataType)
    case other =>
      throw new UnsupportedOperationException(
        s"add_col_arr_to_df: unsupported type $other")
  }
}
