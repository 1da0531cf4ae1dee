package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.SqlBridge

/** Iterative-loop checkpointing: materialize a frame and return one whose
  * LOGICAL PLAN, RDD LINEAGE and PLAN STATISTICS are all truncated.
  *
  * Why not `Dataset.localCheckpoint`: it truncates the first two but
  * (Spark 4, `LogicalRDD.rewriteStatsAndConstraints`) CARRIES the
  * optimized plan's estimated statistics onto the checkpoint leaf. In an
  * iterative algorithm those carried estimates COMPOUND — each round's
  * join-stat products are computed from the previous round's carried
  * BigInts, growing the size estimate's BIT COUNT multiplicatively
  * (~4x/round in the connected-components loop). By round ~10 the
  * optimizer burns minutes multiplying million-digit numbers inside
  * SizeInBytesOnlyStats, and near round 13 `java.math.BigInteger`
  * overflows its 2^31-bit limit ("BigInteger would overflow supported
  * range") — diagnosed live with jstack on a 50k-node CC run, hung in
  * ToomCook3 multiplication. A 12-round compounding regression spec in
  * DedupSpec pins the fix.
  *
  * Mechanics: the executed plan's `InternalRow` RDD is copied (unsafe
  * rows are buffer-reused), `localCheckpoint`ed, counted (materialize
  * NOW — failures and timing surface at the checkpoint, not at a random
  * later action), and wrapped back into a DataFrame through
  * `internalCreateDataFrame` — NO Row round-trip in either direction, so
  * downstream consumers read the stored unsafe rows as-is, however many
  * times the next round's plan references the frame. The new leaf
  * carries constant, round-independent default statistics. On a cluster,
  * swap the RDD `localCheckpoint` for a reliable checkpoint dir when
  * executor loss must be survivable mid-loop.
  */
object Checkpoints {

  def truncated(df: DataFrame): DataFrame = truncatedWithCount(df)._1

  /** [[truncated]] plus the materialized row count — the count action
    * forces materialization anyway, so callers that need cardinality
    * (the CC convergence check) get it for free. */
  def truncatedWithCount(df: DataFrame): (DataFrame, Long) = {
    val internal = df.queryExecution.toRdd.map(_.copy()).localCheckpoint()
    val n = internal.count()
    (SqlBridge.internalCreateDataFrame(df.sparkSession, internal, df.schema),
      n)
  }
}
