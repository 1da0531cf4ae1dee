package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Scalar UDF surface mirroring the reference's `examples/udf/udf.rs` and
  * the 1BRC parser (`examples/algo/one_billion_row_challenge.rs:125-197`).
  *
  * These stay as UDFs to preserve the reference's UDF API surface (F1-F3),
  * but each has a codegen'd built-in alternative noted below — prefer those
  * in hot paths at scale.
  */
object Udfs {

  /** F2 output type: `Struct{city: Utf8, temperature: Float64}`. */
  case class CityTemp(city: Option[String], temperature: Option[Double])

  /** F1: `split_text` — Utf8→Utf8, null-safe (None→None), split on '.'
    * and take the first segment (reference `examples/udf/udf.rs:17-59`).
    * Built-in equivalent: `substring_index(col, ".", 1)`.
    */
  val splitText = udf((s: String) =>
    Option(s).flatMap(_.split('.').headOption))

  /** F1 variant: take the extension (last segment after '.')
    * (reference `examples/udf/udf.rs:62-108`).
    * Built-in equivalent: `substring_index(col, ".", -1)`.
    */
  val splitExt = udf((s: String) =>
    Option(s).flatMap(_.split('.').lastOption))

  /** F2: `split_row` — parse `"city;temp"` into a struct, null-tolerant:
    * unparsable temperature → null field, null input → null row
    * (reference `examples/algo/one_billion_row_challenge.rs:125-197`).
    */
  val splitRow = udf((s: String) => Option(s).map { v =>
    v.split(';') match {
      case Array(city, temp) =>
        CityTemp(Some(city), temp.toDoubleOption)
      case Array(city) => CityTemp(Some(city), None)
      case _ => CityTemp(None, None)
    }
  })

  /** Random alphanumeric string of the given length; used by
    * `DataFrameOps.randomDf` (reference `src/utils/helpers.rs:96-105`).
    * Nondeterministic by design, like the reference's rng.
    */
  val randomString = udf((len: Int) => {
    val chars = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    val r = java.util.concurrent.ThreadLocalRandom.current()
    val n = math.max(len, 0)
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) { sb.append(chars.charAt(r.nextInt(chars.length))); i += 1 }
    sb.toString
  }).asNondeterministic()

  /** Register the SQL-callable names (reference `ctx.register_udf`,
    * `examples/udf/udf.rs:96-105`). */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("split_text", splitText)
    spark.udf.register("split_ext", splitExt)
    spark.udf.register("split_row", splitRow)
  }
}
