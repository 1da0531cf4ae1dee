package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet ROW-GROUP statistics as a queryable frame — the audit that
  * tells an operator whether a table's layout will actually prune
  * before a 100 TB scan pays to find out. `Sinks.writeClustered` /
  * [[ZOrder]] exist to make row-group min/max stanzas selective; this
  * reads those stanzas back (footers only — metadata IO, no row
  * decode) so "is this table well-clustered on k?" is a query, not a
  * guess.
  *
  * Footer reads are distributed: the file list (bounded driver
  * metadata, same scale as any planner's split listing) fans out via
  * `mapPartitions`, each task opening only footers. Executors use a
  * fresh default Hadoop `Configuration` — correct for posix/HDFS
  * defaults; an object-store deployment passes its keys via
  * `confKeys`. */
object ParquetStats {

  /** One row per (file, row group): row count and the column's min/max
    * stanza (integral columns — int32/int64 — surfaced as longs; a
    * missing/untyped stanza yields nulls, never a throw). */
  def rowGroupStats(spark: SparkSession, path: String, column: String,
                    confKeys: Map[String, String] = Map.empty)
      : DataFrame = {
    import spark.implicits._
    val files = spark.read.parquet(path).inputFiles.toIndexedSeq
    require(files.nonEmpty, s"no parquet files under $path")
    spark.createDataset(files)
      .repartition(math.min(files.size, 64))
      .mapPartitions { paths =>
        val conf = new org.apache.hadoop.conf.Configuration()
        confKeys.foreach { case (k, v) => conf.set(k, v) }
        paths.flatMap { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(p), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val blocks = reader.getFooter.getBlocks.asScala.toList
            blocks.zipWithIndex.map { case (b, i) =>
              val st = b.getColumns.asScala
                .find(_.getPath.toDotString == column)
                .map(_.getStatistics)
              def asLong(v: Any): Option[Long] = v match {
                case l: java.lang.Long => Some(l.longValue())
                case n: java.lang.Integer => Some(n.longValue())
                case _ => None
              }
              (p, i, b.getRowCount,
                st.filter(s => !s.isEmpty && s.hasNonNullValue)
                  .flatMap(s => asLong(s.genericGetMin())),
                st.filter(s => !s.isEmpty && s.hasNonNullValue)
                  .flatMap(s => asLong(s.genericGetMax())))
            }
          } finally reader.close()
        }
      }
      .toDF("file", "row_group", "rows", "min", "max")
  }

  /** Fraction of row groups whose [min, max] range overlaps ANY earlier
    * group's range in (min, id) order — 0.0 for perfectly disjoint
    * (clustered) stanzas, approaching 1.0 when every stanza spans the
    * key space (arrival-order writes of uniform keys). Computed as a
    * sort + running-max sweep, never the n² pair join; the input is
    * METADATA-sized (one row per row group, ~10^5-10^6 at 100 TB), so
    * the global window is bounded by construction — the one place a
    * global window is the right tool. Groups without stanzas count as
    * overlapping — a stats-less layout prunes nothing, and the metric
    * must say so. */
  def overlapFraction(stats: DataFrame): Double = {
    // empty stats = nothing to prune with — same defined answer as
    // meanStanzaCoverage, not an NPE from a null aggregate
    if (stats.isEmpty) return 1.0
    val w = Window.orderBy(col("min").asc_nulls_last, col("file"),
        col("row_group"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val row = stats
      .withColumn("prev_max", max(col("max")).over(w))
      .withColumn("olap",
        when(col("min").isNull || col("max").isNull, 1)
          .when(col("prev_max").isNotNull &&
            col("min") <= col("prev_max"), 1)
          .otherwise(0))
      .agg((sum(col("olap")) / count(lit(1))).as("f")).head()
    row.getDouble(0)
  }

  /** Mean fractional key-span of the stanzas: avg((max-min+1) /
    * global span). 1.0 = every group spans the whole key space (prunes
    * nothing); small = tight boxes. The 2-D complement of
    * [[overlapFraction]]: a z-ordered copy REVISITS each dimension's
    * ranges (overlap stays high by design) but keeps every box NARROW,
    * and width is what bounds the decode for a range predicate.
    * Stats-less groups count as full-width. */
  def meanStanzaCoverage(stats: DataFrame): Double = {
    val g = stats.agg(min(col("min")), max(col("max"))).head()
    if (g.isNullAt(0) || g.isNullAt(1)) return 1.0
    val span = (g.getLong(1) - g.getLong(0) + 1).toDouble
    stats.agg((avg(when(col("min").isNull || col("max").isNull, lit(span))
        .otherwise(col("max") - col("min") + 1L)) / span).as("c"))
      .head().getDouble(0)
  }
}
