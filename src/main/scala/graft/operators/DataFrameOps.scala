package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.EngineError.AnalysisError

/** Relational utility surface mirroring the reference's
  * `src/utils/dataframe.rs` / `src/utils/helpers.rs` DataFrame helpers,
  * re-expressed lazily on Catalyst. Everything here composes into a single
  * logical plan — no driver-side materialization unless the reference's
  * semantics demand it (see `registerMaterialized`).
  */
object DataFrameOps {

  /** P8: filter by a SQL predicate fragment — analogue of the reference's
    * `df_sql` / `parse_sql_expr` (reference `src/utils/dataframe.rs:67-71`,
    * `examples/dataframe/query.rs:74-76`).
    * `dfSql(df, "speed > 10 and car in ('red','green')")`.
    * Catalyst parses the fragment, so pushdown/pruning still apply.
    */
  def dfSql(df: DataFrame, predicate: String): DataFrame =
    df.filter(expr(predicate))

  /** C11: `is_empty` (reference `src/utils/dataframe.rs:104-111`). Spark's
    * `isEmpty` is the same limit-1 probe the reference's first-batch pull is.
    */
  def isEmpty(df: DataFrame): Boolean = df.isEmpty

  /** C10: `get_column_names` — `None` for a zero-column schema
    * (reference `src/utils/dataframe.rs:131-142`). */
  def columnNames(df: DataFrame): Option[Seq[String]] =
    Option(df.columns.toSeq).filter(_.nonEmpty)

  /** P4: `select_all_exclude` — drop the given columns, silently ignoring
    * unknown names (reference `src/utils/helpers.rs:505-515`; ignore-unknown
    * asserted at `tests/api/helpers_tests.rs:596-597`). `df.drop` has the
    * same ignore-unknown contract. Order of remaining columns is preserved.
    */
  def selectAllExclude(df: DataFrame, exclude: Seq[String]): DataFrame =
    df.drop(exclude: _*)

  /** U1: union-all of same-schema frames — `concat_dfs`
    * (reference `src/utils/dataframe.rs:290-308`). The reference collects
    * eagerly; Spark's `unionByName` yields identical rows lazily and scales
    * (no driver materialization), so we keep it lazy. The empty-input error
    * message is part of the reference contract (`dataframe.rs:294-298`).
    */
  def concatDfs(dfs: Seq[DataFrame]): DataFrame = {
    if (dfs.isEmpty) throw AnalysisError("No dataframes provided")
    dfs.reduce(_ unionByName _)
  }

  /** J4: n-way inner join on shared key columns — `join_dfs`
    * (reference `src/utils/dataframe.rs:860-882`). The reference renames
    * right-side keys `{c}_rhs{i}` then drops them post-join; Spark's
    * `usingColumns` join already emits a single copy of each key, so the
    * fold is the whole implementation. Duplicate-key (many-to-many)
    * semantics match the reference doctest (`dataframe.rs:843-855`).
    */
  def joinDfs(dfs: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    if (dfs.isEmpty) throw AnalysisError("No dataframes provided")
    dfs.reduce((l, r) => l.join(r, keys, "inner"))
  }

  /** S10: materialized registration — snapshot semantics: later changes to
    * the source are invisible through the registered name
    * (reference `register_materialized_df`, `src/utils/dataframe.rs:738-748`).
    * cache + count forces the snapshot; at cluster scale the cache spills
    * to executor-local disk rather than the driver.
    */
  def registerMaterialized(df: DataFrame, name: String): DataFrame = {
    val cached = df.cache()
    cached.count()
    cached.createOrReplaceTempView(name)
    cached
  }

  /** S11/S12: lazy view registration — the optimizer sees through the view
    * (reference `register_df_view`, `src/utils/dataframe.rs:781-790`). */
  def registerView(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)

  /** S13: zero-column zero-row frame (reference `get_empty_df`,
    * `src/utils/helpers.rs:34-38`). */
  def emptyDf(spark: SparkSession): DataFrame = spark.emptyDataFrame

  /** S14: zero-column ONE-row relation — DataFusion's `read_empty` quirk
    * (reference `src/utils/helpers.rs:27-30`): a OneRowRelation, so
    * `isEmpty` is false. */
  def oneRowRelation(spark: SparkSession): DataFrame =
    spark.sql("select 1 as one").drop("one")

  /** S15: random frame generator — n rows of random values per requested
    * type, columns named `column_1..column_k`
    * (reference `get_random_df`, `src/utils/helpers.rs:69-127`).
    * Expressed on `spark.range` so generation is distributed (each
    * partition generates its own rows — no driver-side array).
    */
  def randomDf(spark: SparkSession, types: Seq[DataType], rows: Long): DataFrame = {
    val base = spark.range(rows)
    val cols = types.zipWithIndex.map { case (dt, i) =>
      val c: Column = dt match {
        case IntegerType => (rand() * Int.MaxValue).cast(IntegerType)
        case FloatType   => rand().cast(FloatType)
        case DoubleType  => rand()
        case BooleanType => rand() > 0.5
        case StringType  =>
          // random alphanumeric, length 1..50, like the reference's
          // Alphanumeric sampler (`helpers.rs:96-105`)
          graft.functions.Udfs.randomString((rand() * 49 + 1).cast(IntegerType))
        case other =>
          throw AnalysisError(s"randomDf: unsupported type $other")
      }
      c.as(s"column_${i + 1}")
    }
    base.select(cols: _*)
  }

  /** W3: bulk-attach aliased window expressions — the reference's
    * `df.window(vec![...])` (reference `examples/dataframe/query.rs:253-260`).
    * Pass pre-aliased columns (`count(c).over(w).as("cnt")`). */
  def withWindowColumns(df: DataFrame, exprs: Seq[Column]): DataFrame =
    df.select((df.columns.map(col).toSeq ++ exprs): _*)

  /** U3: `concat_arrays` — column-major extraction of the whole frame
    * (reference `src/utils/dataframe.rs:198-214`). Driver-side action by
    * design (same caveat as the reference: whole frame on the host); for
    * large data use columnValues on a projected/filtered frame instead.
    */
  def concatArrays(df: DataFrame): Map[String, Seq[Any]] = {
    val names = df.columns
    val rows = df.collect()
    names.zipWithIndex.map { case (n, i) => n -> rows.map(_.get(i)).toSeq }.toMap
  }
}
