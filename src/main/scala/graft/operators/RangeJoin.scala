package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucketing — the second join family
  * Spark's equi-join surface lacks (a raw `start <= p AND p <= end`
  * condition degenerates to BroadcastNestedLoopJoin: every point against
  * every interval).
  *
  * The scale path: quantize the number line into `bucketWidth` buckets;
  * each point hashes to one bucket, each interval explodes to the
  * buckets it overlaps, and an equi-join on bucket (plus any key
  * columns) produces candidates that one residual filter finalizes. Each
  * (point, interval) match is produced exactly once — the point's bucket
  * intersects the interval's bucket range exactly once — so no distinct
  * is needed. Shuffle volume is |points| + Σ(interval span / width), and
  * the tuning rule is width ≈ median interval length (wider: more false
  * candidates per bucket; narrower: more bucket replicas per interval).
  * Long intervals are the skew lever — cap or split outliers upstream.
  *
  * Bounds are inclusive on both ends. Caller disambiguates any column
  * names shared between the two frames (as with any Spark join).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long,
                      keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    p.join(iv, Seq("__bucket") ++ keyCols)
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
