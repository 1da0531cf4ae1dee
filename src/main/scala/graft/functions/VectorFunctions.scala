package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns, built purely from
  * codegen'd builtins (`zip_with` / `aggregate` / `transform`) — no UDFs,
  * so whole-stage codegen stays intact in the hot ANN/dedup paths.
  *
  * All math is done in double: inputs are cast element-wise first, so a
  * float-typed embedding column and a double oracle agree bit-for-bit on
  * the sequential left-fold accumulation.
  */
object VectorFunctions {

  /** Element-wise cast to array<double>. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product: left-fold sum of element-wise products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(toDouble(a), lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(normSq(a)) * sqrt(normSq(b))
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))
}
