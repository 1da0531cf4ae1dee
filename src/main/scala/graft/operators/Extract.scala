package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Typed extraction utilities — the reference's downcast walks re-expressed
  * through Encoders (reference `examples/dataframe/operations.rs:382-425`,
  * `examples/dataframe/actions.rs:22-110`, `src/utils/helpers.rs:546-576`,
  * `src/utils/scalarvalue.rs:32-60`).
  *
  * These are driver-side actions by design (the reference's are too);
  * always project/filter before extracting at scale.
  */
object Extract {

  /** C16: column → typed host values, `columnValues[Long](df, "id")`. */
  def columnValues[T: Encoder](df: DataFrame, name: String): Seq[T] =
    df.select(name).as[T](implicitly[Encoder[T]]).collect().toSeq

  /** C12: `extract_struct_array_values` — struct column → row-wise string
    * matrix; null row → empty seq, null field → "null"
    * (reference `src/utils/helpers.rs:546-576`). */
  def structValues(df: DataFrame, name: String): Seq[Seq[String]] =
    df.select(name).collect().toSeq.map { outer =>
      outer.get(0) match {
        case null => Seq.empty[String]
        case r: Row =>
          r.toSeq.map(v => if (v == null) "null" else v.toString)
      }
    }

  /** C13: `try_from_array` — single element extraction by row/column
    * (reference `src/utils/scalarvalue.rs:10-12`); driver-side, use on
    * small/collected frames only. */
  def valueAt(df: DataFrame, rowIdx: Int, colName: String): Any =
    df.select(colName).take(rowIdx + 1).lastOption
      .map(_.get(0)).orNull

  /** C14: `parse_strings` — parse strings to a typed vector; unparsable →
    * null (reference `src/utils/scalarvalue.rs:32-60`). UInt32 widens to
    * Long (Spark has no unsigned types, SURVEY §7.3). */
  def parseStrings(values: Seq[String], dataType: DataType): Seq[Any] =
    dataType match {
      case IntegerType => values.map(v => Option(v).flatMap(_.toIntOption).orNull)
      case LongType    => values.map(v => Option(v).flatMap(_.toLongOption).orNull)
      case StringType  => values
      case other =>
        throw new UnsupportedOperationException(s"parse_strings: $other")
    }

  /** Cast-based distributed analogue of parseStrings: bad input → null,
    * same contract, but stays on the cluster. `try_cast` (not `cast`)
    * because ANSI mode — Spark 4's default — makes a plain cast throw on
    * malformed input, while the reference contract is unparsable → null. */
  def parseColumn(df: DataFrame, name: String, dataType: DataType): DataFrame =
    df.withColumn(name, col(name).try_cast(dataType))
}
