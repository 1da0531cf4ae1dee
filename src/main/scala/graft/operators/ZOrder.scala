package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for MULTI-column data layout — the lever
  * single-column range clustering can't provide. `Sinks.writeClustered`
  * sorts by one key, so a scan filtering on a second column decodes
  * everything the first column's row-group stanzas admit; interleaving
  * the bits of two keys gives every parquet row group a tight min/max
  * box in BOTH dimensions, and a 2-predicate selective scan prunes on
  * each (the `bench_layout2d_*` rig measures it in decoded rows).
  *
  * The z value is pure codegen'd integer arithmetic (magic-mask bit
  * spreading — shift/and/or only, no UDF), and the identical mask chain
  * replays in any engine: the `x_zorder` query certifies every z value
  * against DuckDB bit-for-bit.
  */
object ZOrder {

  /** Spread the low 16 bits of a non-negative long so bit i lands at
    * position 2i (the even positions): the classic 4-step magic-mask
    * ladder. Plain shift/and/or — portable and codegen'd. */
  private[graft] def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton/Z value of two columns' low 16 bits: x on even bit
    * positions, y on odd — a 32-bit curve position. Callers with keys
    * outside [0, 65536) map them into 16-bit space first (proportional
    * bucketing or rank); the rig and query keys fit natively. */
  def zorderValue(x: Column, y: Column): Column =
    spread16(x.cast("long"))
      .bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** The DuckDB-dialect expression computing exactly [[spread16]] —
    * kept HERE, next to the Column form, so the two mask ladders can
    * never drift apart silently. Textual substitution duplicates each
    * step's operand (2^4 copies of the innermost term) — fine for an
    * oracle, wrong for the engine side, which is why the Column form
    * exists. */
  private[graft] def spread16Sql(c: String): String = {
    // ::BIGINT first: on an INT32 column the final `<< 1` in
    // zorderValueSql would overflow 32-bit arithmetic (bit 30 is set
    // for y >= 32768) — the Column form computes in long, and the twin
    // must too for ANY input type
    val a = s"(($c)::BIGINT & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val d4 = s"(($b | ($b << 4)) & 252645135)"
    val d2 = s"(($d4 | ($d4 << 2)) & 858993459)"
    s"(($d2 | ($d2 << 1)) & 1431655765)"
  }

  /** DuckDB-dialect z-value expression (see [[zorderValue]]). */
  def zorderValueSql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  /** Write a z-ordered parquet copy: range-partitioned AND sorted by
    * the interleaved curve position, so file ranges are curve-disjoint
    * and every row group's min/max stanza is a tight 2-D box. The z
    * expression never lands in the data — it exists only as the
    * write-time ordering. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String,
                    yCol: String, numFiles: Int = 16,
                    options: Map[String, String] = Map.empty): Unit = {
    val z = zorderValue(col(xCol), col(yCol))
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
      .write.mode("overwrite").options(options).parquet(path)
  }

  /** Map an arbitrary-range numeric column into [0, 65536) by
    * proportional min/max scaling — the bridge from real keys to
    * [[zorderValue]]'s 16-bit space. Integer arithmetic on longs, so
    * the mapping is deterministic and engine-portable; a constant
    * column maps to 0. Monotone, which is all curve ordering needs
    * (pruning works on the ORDER of buckets, not their spacing), but
    * proportional scaling keeps skewed keys skewed — heavy skew wants
    * rank bucketing upstream, at the cost of a corpus sort per
    * dimension. */
  private[graft] def scaleTo16(c: Column, lo: Column, hi: Column): Column =
    when(hi <= lo, lit(0L)).otherwise(
      least(lit(65535L),
        // Column `/` is DOUBLE division in Spark SQL — make the floor
        // explicit. Exact for key ranges < 2^37 (the product stays
        // inside double's 2^53 integer window); beyond that the bucket
        // boundary can drift an ulp, which write-time ORDERING absorbs
        floor((c.cast("long") - lo).cast("double") * 65536.0d /
          (hi - lo + 1L).cast("double")).cast("long")))

  /** [[writeZOrdered]] for columns of ANY integer range: one tiny
    * min/max aggregate (a single driver row — bounded, like the CC
    * gate's probe), then the scaled interleave orders the write. The
    * scan-side predicates stay on the ORIGINAL columns — scaling only
    * decides row order, so readers need no knowledge of it. */
  /** Driver-side guard for [[scaleTo16]]'s divisor: `hi - lo + 1` must
    * be representable in a long, or the Column arithmetic silently
    * overflows to a NEGATIVE divisor and the write degrades to an
    * unclustered layout with no error (e.g. raw xxhash64 keys spanning
    * Long.MinValue..Long.MaxValue). Keys that wide should be bucketed
    * (rank or modulo) before scaling — the error says so. */
  private def checkedSpan(name: String, lo: Long, hi: Long): Unit =
    try { Math.addExact(Math.subtractExact(hi, lo), 1L); () }
    catch {
      case _: ArithmeticException => throw new IllegalArgumentException(
        s"z-order column '$name' spans [$lo, $hi] — wider than a 63-bit " +
          "range, so proportional scaling would overflow its divisor " +
          "and produce an unclustered layout; bucket the key (rank or " +
          "modulo into a sub-2^63 range) before z-ordering")
    }

  def writeZOrderedScaled(df: DataFrame, path: String, xCol: String,
                          yCol: String, numFiles: Int = 16,
                          options: Map[String, String] = Map.empty): Unit = {
    val mm = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    require(!mm.anyNull, s"cannot z-order an empty frame into $path")
    checkedSpan(xCol, mm.getLong(0), mm.getLong(1))
    checkedSpan(yCol, mm.getLong(2), mm.getLong(3))
    val z = zorderValue(
      scaleTo16(col(xCol), lit(mm.getLong(0)), lit(mm.getLong(1))),
      scaleTo16(col(yCol), lit(mm.getLong(2)), lit(mm.getLong(3))))
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
      .write.mode("overwrite").options(options).parquet(path)
  }

  /** The skew-proof variant: EQUAL-FREQUENCY rank buckets per dimension
    * instead of proportional value scaling. Proportional scaling
    * collapses under heavy skew (90% of rows on one key → 90% of rows
    * in one curve cell, and that dimension prunes nothing); rank
    * bucketing spends the curve's resolution where the data actually
    * is. Spark's OWN range partitioner does the ranking — one
    * `repartitionByRange` per dimension (sampled boundaries, the same
    * machinery every sort uses at scale; no global window anywhere),
    * with `spark_partition_id()` as the bucket id, which is ascending
    * in the key by the partitioner's contract. Cost: one extra shuffle
    * per dimension over [[writeZOrderedScaled]] — the "sort per
    * dimension" the scaled form's scaladoc warns heavy skew demands.
    * Sampled boundaries make bucket EDGES run-dependent; only the
    * write-time ORDER depends on them, never row content or reader
    * predicates. */
  def writeZOrderedRanked(df: DataFrame, path: String, xCol: String,
                          yCol: String, numFiles: Int = 16,
                          buckets: Int = 1024,
                          options: Map[String, String] = Map.empty): Unit = {
    require(buckets > 1 && buckets <= 65536,
      s"buckets must be in (1, 65536]: $buckets")
    require(!df.columns.contains("__zx") && !df.columns.contains("__zy"),
      "input already has a __zx/__zy column — the bucket scratch " +
        "columns would silently replace it")
    val withXb = df.repartitionByRange(buckets, col(xCol))
      .withColumn("__zx", spark_partition_id().cast("long"))
    val withYb = withXb.repartitionByRange(buckets, col(yCol))
      .withColumn("__zy", spark_partition_id().cast("long"))
    val z = zorderValue(col("__zx"), col("__zy"))
    withYb.repartitionByRange(numFiles, z).sortWithinPartitions(z)
      .select(df.columns.map(col).toIndexedSeq: _*)
      .write.mode("overwrite").options(options).parquet(path)
  }
}
