package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, attach the right row with
  * the greatest timestamp <= the left row's timestamp, per key (pandas
  * `merge_asof` / kdb `aj` semantics). One of the operators Spark's
  * built-in join surface genuinely lacks.
  *
  * Implementation is the union trick, not a range join: tag and union
  * both sides, then per key in timestamp order carry the right side's
  * values forward with `last(..., ignoreNulls = true)` over an
  * unbounded-preceding window, and keep only left rows. Cost is ONE
  * shuffle + sort on (keys, ts) — the same shape as a window aggregate —
  * instead of the O(|left| x |right per key|) expansion a
  * `l.ts >= r.ts` theta-join suffers, so it holds at 100 TB exactly like
  * sessionization does. Ties (left.ts == right.ts) are inclusive: the
  * right row sorts first and is visible to the left row, matching
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` (which oracles this
  * operator).
  *
  * Contract: `right` must be unique per (keyCols, tsCol) — pre-aggregate
  * if necessary — otherwise which duplicate wins is plan-dependent.
  * Rows with no earlier right row get NULLs (left-join semantics).
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   tsCol: String, valueCols: Seq[String],
                   prefix: String = "asof_"): DataFrame = {
    val leftOther = left.columns.toSeq
      .filterNot(keyCols.contains).filterNot(_ == tsCol)
    val lSel = left.columns.toSeq.map(col) ++
      valueCols.map(v =>
        lit(null).cast(right.schema(v).dataType).as(prefix + v)) :+
      lit(1).as("__is_left")
    val rSel = keyCols.map(col) ++ Seq(col(tsCol)) ++
      leftOther.map(c =>
        lit(null).cast(left.schema(c).dataType).as(c)) ++
      valueCols.map(v => col(v).as(prefix + v)) :+
      lit(0).as("__is_left")
    val u = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(u) { (df, v) =>
      df.withColumn(prefix + v,
        last(col(prefix + v), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_left") === 1).drop("__is_left")
  }
}
