package graft.convert

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Case-class ⇄ DataFrame bridges — the reference's serde / manual /
  * `TryFrom` conversion trio collapses to Encoders
  * (reference `examples/dataframe/convert_vec_structs_to_df.rs:10-65`,
  * `_v2.rs:33-65`, `_v3.rs:45-73`, `deserialize_to_struct.rs:10-201`).
  */
object Convert {

  /** Structs → DataFrame (reference `convert_vec_structs_to_df`). */
  def toDf[T <: Product: TypeTag](spark: SparkSession, values: Seq[T]): DataFrame =
    spark.createDataFrame(values)

  /** DataFrame → typed Dataset (lazy; reference `deserialize_to_struct`). */
  def toDs[T <: Product: TypeTag](df: DataFrame): Dataset[T] =
    df.as[T](Encoders.product[T])

  /** DataFrame → host structs (eager collect, like the reference's
    * stream-batches-and-izip walk). */
  def toStructs[T <: Product: TypeTag](df: DataFrame): Seq[T] =
    toDs[T](df).collect().toSeq

  /** Missing-column-tolerant read: absent fields become typed nulls —
    * analogue of the reference's null-tolerant variant
    * (reference `examples/dataframe/deserialize_to_struct.rs:125-201`).
    * Fields must be Option[_] in T for missing columns to decode.
    */
  def toStructsTolerant[T <: Product: TypeTag](df: DataFrame): Seq[T] = {
    val enc = Encoders.product[T]
    val have = df.columns.toSet
    val cols = enc.schema.fields.map { f =>
      if (have.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    toStructs[T](df.select(cols.toIndexedSeq: _*))
  }
}
