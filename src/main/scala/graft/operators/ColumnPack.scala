package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.EngineError.AnalysisError

/** Column-packing operators — the reference library's signature surface
  * (reference `src/utils/dataframe.rs:362-415` / `:471-518`).
  *
  * Unlike the reference, which materializes the whole frame host-side and
  * re-enters the engine (`concat_arrays` → arrow-json → `read_batch`),
  * both operators here are pure lazy Catalyst expressions (`to_json`,
  * `struct`) that stay inside whole-stage codegen — no driver round-trip,
  * so they hold at any scale.
  */
object ColumnPack {

  private def requireCols(df: DataFrame, cols: Seq[String]): Unit = {
    val have = df.columns.toSet
    cols.find(!have.contains(_)).foreach { missing =>
      // message text is part of the reference contract
      // (reference `src/utils/dataframe.rs:1051-1063`)
      throw AnalysisError(s"column $missing not found")
    }
  }

  /** C1: `df_cols_to_json` — pack the given columns into a JSON-object
    * *string* column and drop the sources. Reference semantics preserved:
    * keys alphabetically sorted (serde_json map order), null fields
    * omitted, floats keep their `.0`
    * (reference `src/utils/dataframe.rs:362-415`, goldens `:330-355`,
    * `:1067-1075`). Spark's `to_json` drops nulls by default
    * (`spark.sql.jsonGenerator.ignoreNullFields=true`).
    */
  def colsToJson(df: DataFrame, cols: Seq[String], newCol: String): DataFrame = {
    requireCols(df, cols)
    val sorted = cols.sorted // alphabetical key order, like serde_json's BTreeMap
    df.withColumn(newCol, to_json(struct(sorted.map(col): _*)))
      .drop(cols: _*)
  }

  /** C2: `df_cols_to_struct` — pack the given columns into a nested struct
    * column and drop the sources. Field order = caller's column order (NOT
    * sorted), matching the reference
    * (reference `src/utils/dataframe.rs:471-518`; SQL shape noted at
    * `:466-467`: `select time, struct(car as car, speed as speed) as s`).
    */
  def colsToStruct(df: DataFrame, cols: Seq[String], newCol: String): DataFrame = {
    requireCols(df, cols)
    df.withColumn(newCol, struct(cols.map(col): _*))
      .drop(cols: _*)
  }
}
