package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed probabilistic sketches with DETERMINISTIC md5-derived
  * hashes: count-min (approximate frequencies over an unbounded key
  * stream in O(width x depth) memory) and Bloom filters (the semi-join
  * reduction workhorse — broadcast a few KB of bits to prefilter a huge
  * probe side before an expensive join/shuffle).
  *
  * Unlike the engine-native sketches (HLL / approx_percentile, which get
  * accuracy-claim oracles because their internals are engine-specific),
  * these are built from md5 prefixes, so an external engine rebuilds the
  * SAME sketch bit-for-bit and the oracle checks exact values — the
  * sketch structure itself is under test, not just its error bound.
  *
  * Scale shape: both builds are one explode (x depth or x k hashes) and
  * one groupBy on (row-of-sketch) keys with map-side partial aggregation;
  * sketch frames are tiny (width x depth counters / bits/64 words) and
  * meant to be broadcast at probe time.
  */
object Sketches {

  /** Row hash d of `key` in [0, width): deterministic, engine-portable
    * (DuckDB twin: `('0x'||substr(md5('cm:'||d||':'||key),1,8))::BIGINT
    * % width`). */
  private def cmBucket(key: Column, d: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cm:$d:"), key.cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("long") % width

  /** Count-min sketch over a key column: (d, bucket, cnt) — depth rows of
    * width counters. Point estimate = min over d of the bucket count
    * (never under-counts; over-counts by collisions, bounded by
    * eps = e/width with prob 1 - e^-depth). */
  def countMin(df: DataFrame, keyCol: String, width: Int = 256,
               depth: Int = 3): DataFrame = {
    val rows = (0 until depth).map(d =>
      struct(lit(d).as("d"), cmBucket(col(keyCol), d, width).as("bucket")))
    df.select(explode(array(rows: _*)).as("h"))
      .groupBy(col("h.d").as("d"), col("h.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each distinct key in `probes`
    * against a count-min sketch: joins each (key, d, bucket) to the
    * sketch (broadcast — it is at most width x depth rows) and takes the
    * min across rows. Keys hashing to never-incremented buckets estimate
    * 0. Output: (key, est). */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame,
                       keyCol: String, width: Int = 256,
                       depth: Int = 3): DataFrame = {
    val rows = (0 until depth).map(d =>
      struct(lit(d).as("d"), cmBucket(col(keyCol), d, width).as("bucket")))
    probes.select(col(keyCol), explode(array(rows: _*)).as("h"))
      .join(broadcast(sketch),
        col("h.d") === sketch("d") && col("h.bucket") === sketch("bucket"),
        "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Bit position h of `key` in [0, bits) — the Bloom hash family. */
  private def bloomPos(key: Column, h: Int, bits: Int): Column =
    conv(substring(md5(concat(lit(s"bf:$h:"), key.cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("long") % bits

  /** Build a Bloom filter over a key column as (word, mask) rows: word =
    * pos / 32, mask = OR of 1L << (pos % 32) — 32-bit words in long
    * cells (shift stays <= 31, which every engine's checked left-shift
    * accepts; 1L << 63 overflows DuckDB's BIGINT), built with one
    * explode (x k hashes) and one bit_or groupBy. The frame IS the
    * filter; broadcast it to prefilter a probe side. */
  def bloomBuild(df: DataFrame, keyCol: String, bits: Int = 4096,
                 k: Int = 3): DataFrame = {
    val pos = (0 until k).map(h => bloomPos(col(keyCol), h, bits))
    df.select(explode(array(pos: _*)).as("pos"))
      .select(floor(col("pos") / 32).cast("long").as("word"),
        expr("shiftleft(1L, cast(pos % 32 as int))").as("m"))
      .groupBy("word").agg(expr("bit_or(m)").as("mask"))
  }

  /** Membership probe: true iff all k bits are set — no false negatives,
    * false positives at ~(1 - e^{-kn/bits})^k. The filter joins
    * broadcast on word; a probe whose word is absent fails immediately.
    * Output: probes plus (might_contain). */
  def bloomMightContain(filter: DataFrame, probes: DataFrame,
                        keyCol: String, bits: Int = 4096,
                        k: Int = 3): DataFrame = {
    val pos = (0 until k).map(h => bloomPos(col(keyCol), h, bits))
    probes.select(col(keyCol), explode(array(pos: _*)).as("pos"))
      .select(col(keyCol), floor(col("pos") / 32).cast("long").as("word"),
        (col("pos") % 32).cast("int").as("bit"))
      .join(broadcast(filter), Seq("word"), "left")
      .select(col(keyCol),
        (coalesce(col("mask"), lit(0L))
          .bitwiseAND(expr("shiftleft(1L, bit)")) =!= 0L).as("hit"))
      .groupBy(col(keyCol))
      .agg(expr("bool_and(hit)").as("might_contain"))
  }
}
