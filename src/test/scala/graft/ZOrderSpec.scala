package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Morton-interleave tests: expected z values are hand-computed from
  * the bit definition (x bits on even positions, y on odd). */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def z(x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(ZOrder.zorderValue(col("x"), col("y")).as("z"))
      .as[Long].collect()(0)

  test("zorderValue matches hand-computed interleaves") {
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)     // x bit 0 -> z bit 0
    assert(z(0, 1) == 2L)     // y bit 0 -> z bit 1
    // x=3 (011), y=5 (101): z bits y2x2 y1x1 y0x0 = 100111 = 39
    assert(z(3, 5) == 39L)
    assert(z(65535, 0) == 0x55555555L)
    assert(z(0, 65535) == 0xAAAAAAAAL)
    assert(z(65535, 65535) == 0xFFFFFFFFL)
    // only the low 16 bits participate
    assert(z(65536 + 3, 5) == 39L)
  }

  test("z order preserves aligned-square locality: one contiguous range") {
    // every point of an aligned 4x4 square occupies one contiguous
    // 16-value z range — the property the 2-D layout rig's box scan
    // exploits (x0, y0 multiples of the square side)
    val zs = for (x <- 8L until 12L; y <- 4L until 8L) yield z(x, y)
    assert(zs.min == z(8, 4) && zs.max == zs.min + 15)
    assert(zs.toSet.size == 16)
  }

  test("the DuckDB-dialect z expression is the same function") {
    // evaluate the SQL form IN SPARK (operators are shared syntax) over
    // a value grid and compare against the Column form — the mask
    // ladders cannot drift apart without this failing
    val df = spark.range(200).select(
      (col("id") * 337 % 65536).as("x"),
      (col("id") * 7919 % 65536).as("y"))
    val mismatches = df.select(
        ZOrder.zorderValue(col("x"), col("y")).as("zc"),
        expr(ZOrder.zorderValueSql("x", "y")).as("zs"))
      .filter(col("zc") =!= col("zs")).count()
    assert(mismatches == 0L)
  }

  private def z3(x: Long, y: Long, w: Long): Long =
    Seq((x, y, w)).toDF("x", "y", "w")
      .select(ZOrder.zorderValueN(
        Seq(col("x"), col("y"), col("w"))).as("z"))
      .as[Long].collect()(0)

  test("zorderValueN at k=2 IS zorderValue (delegated mask ladder)") {
    val df = spark.range(300).select(
      (col("id") * 337 % 65536).as("x"), (col("id") * 7919 % 65536).as("y"))
    val mism = df.select(
        ZOrder.zorderValue(col("x"), col("y")).as("a"),
        ZOrder.zorderValueN(Seq(col("x"), col("y"))).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mism == 0L)
    intercept[IllegalArgumentException] {
      ZOrder.zorderValueN(Seq(col("x")))
    }
  }

  test("3-column interleave matches hand-computed bit positions") {
    // column j's bit i lands at position 3i + j
    assert(z3(0, 0, 0) == 0L)
    assert(z3(1, 0, 0) == 1L)
    assert(z3(0, 1, 0) == 2L)
    assert(z3(0, 0, 1) == 4L)
    // x=3 (bits 0,1), y=5 (bits 0,2), w=6 (bits 1,2):
    // positions x:{0,3} y:{1,7} w:{5,8} -> 1+8+2+128+32+256 = 427
    assert(z3(3, 5, 6) == 427L)
    // each column contributes its low floor(32/3)=10 bits only
    assert(z3(1024 + 3, 5, 6) == 427L)
    assert(z3(1023, 1023, 1023) == (1L << 30) - 1)
  }

  test("3-column DuckDB-dialect twin is the same function") {
    val df = spark.range(200).select(
      (col("id") * 337 % 1024).as("x"), (col("id") * 7919 % 1024).as("y"),
      (col("id") * 131 % 1024).as("w"))
    val mism = df.select(
        ZOrder.zorderValueN(Seq(col("x"), col("y"), col("w"))).as("zc"),
        expr(ZOrder.zorderValueNSql(Seq("x", "y", "w"))).as("zs"))
      .filter(col("zc") =!= col("zs")).count()
    assert(mism == 0L)
  }

  test("3-D aligned cube locality: one contiguous 64-value range") {
    val zs = for (x <- 8L until 12L; y <- 4L until 8L; w <- 12L until 16L)
      yield z3(x, y, w)
    assert(zs.min == z3(8, 4, 12) && zs.max == zs.min + 63)
    assert(zs.toSet.size == 64)
  }

  test("3-column scaled and ranked writes round-trip; ranked enforces " +
      "the per-dimension bucket budget") {
    val base = java.nio.file.Files
      .createTempDirectory("zorder3").toString
    val df = spark.range(20000).select(
      (col("id") * 1000003L - 500000000L).as("x"),
      (col("id") * 31 % 50000).as("y"),
      (col("id") % 97).as("w"), col("id").as("v"))
    ZOrder.writeZOrderedScaled(df, s"$base/s", Seq("x", "y", "w"),
      numFiles = 4)
    val backS = spark.read.parquet(s"$base/s")
    assert(backS.count() == 20000L &&
      backS.columns.sorted.toSeq == Seq("v", "w", "x", "y"))
    ZOrder.writeZOrderedRanked(df, s"$base/r", Seq("x", "y", "w"),
      numFiles = 4, buckets = 256)
    val backR = spark.read.parquet(s"$base/r")
    assert(backR.count() == 20000L &&
      backR.columns.sorted.toSeq == Seq("v", "w", "x", "y"))
    assert(backR.agg(sum("v")).as[Long].collect()(0) ==
      df.agg(sum("v")).as[Long].collect()(0))
    // 3 columns get 10 bits each: 2048 buckets cannot fit
    val e = intercept[IllegalArgumentException] {
      ZOrder.writeZOrderedRanked(df, s"$base/bad", Seq("x", "y", "w"),
        buckets = 2048)
    }
    assert(e.getMessage.contains("1024"))
    // the DEFAULT bucket count adapts to the arity's bit budget: at
    // k=5 (6 bits, 64 cells) a fixed 1024 default would reject every
    // call — the advertised 2..8-column contract must work untouched
    val df5 = df.withColumn("a", col("v") % 7)
      .withColumn("b", col("v") % 11)
    ZOrder.writeZOrderedRanked(df5, s"$base/r5",
      Seq("x", "y", "w", "a", "b"), numFiles = 2)
    assert(spark.read.parquet(s"$base/r5").count() == 20000L)
  }

  test("writeZOrderedScaled handles arbitrary key ranges") {
    val path = java.nio.file.Files
      .createTempDirectory("zorder_scaled").toString
    // keys far outside 16-bit space, negative included
    val df = spark.range(5000).select(
      (col("id") * 1000003L - 2000000000L).as("x"),
      (col("id") * 7 + 3000000000L).as("y"), col("id").as("v"))
    ZOrder.writeZOrderedScaled(df, path, Seq("x", "y"), numFiles = 4)
    val back = spark.read.parquet(path)
    assert(back.count() == 5000L)
    assert(back.agg(sum("v")).as[Long].collect()(0) ==
      df.agg(sum("v")).as[Long].collect()(0))
    // scan predicates stay on the ORIGINAL columns
    val lo = -2000000000L + 1000003L * 100
    val hi = -2000000000L + 1000003L * 200
    assert(back.filter(col("x") >= lo && col("x") < hi).count() == 100L)
    // degenerate inputs: constant column is fine, empty frame refuses
    ZOrder.writeZOrderedScaled(
      df.withColumn("x", lit(7L)), path, Seq("x", "y"), numFiles = 2)
    assert(spark.read.parquet(path).count() == 5000L)
    intercept[IllegalArgumentException] {
      ZOrder.writeZOrderedScaled(df.limit(0), path, "x", "y")
    }
  }

  test("writeZOrderedRanked survives heavy skew and round-trips data") {
    val path = java.nio.file.Files
      .createTempDirectory("zorder_ranked").toString
    // 90% of x values identical — proportional scaling would put 90% of
    // rows in one curve cell; rank bucketing must still round-trip and
    // keep original-column predicates exact
    val df = spark.range(20000).select(
      when(col("id") % 10 < 9, lit(7L))
        .otherwise(col("id") * 13 % 100000).as("x"),
      (col("id") * 31 % 50000).as("y"), col("id").as("v"))
    ZOrder.writeZOrderedRanked(df, path, Seq("x", "y"), numFiles = 4,
      buckets = 64)
    val back = spark.read.parquet(path)
    assert(back.count() == 20000L)
    assert(back.columns.sorted.toSeq == Seq("v", "x", "y"),
      "bucket scratch columns must not land in the data")
    assert(back.agg(sum("v")).as[Long].collect()(0) ==
      df.agg(sum("v")).as[Long].collect()(0))
    assert(back.filter(col("x") === 7L).count() ==
      df.filter(col("x") === 7L).count())
    intercept[IllegalArgumentException] {
      ZOrder.writeZOrderedRanked(df, path, Seq("x", "y"), buckets = 1)
    }
  }

  test("writeZOrderedScaled refuses a >=2^63 key span instead of " +
      "silently unclustering") {
    // raw xxhash64-style keys span Long.MinValue..Long.MaxValue; the
    // scaling divisor (hi - lo + 1) overflows, which pre-fix produced a
    // negative divisor and an unclustered layout with no error
    val path = java.nio.file.Files
      .createTempDirectory("zorder_span").toString
    val wide = Seq((Long.MinValue, 1L), (Long.MaxValue, 2L)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      ZOrder.writeZOrderedScaled(wide, path, "x", "y")
    }
    assert(e.getMessage.contains("'x'") && e.getMessage.contains("2^63"))
    // the guard is per-column: a sane x with a wide y names y
    val wideY = Seq((1L, Long.MinValue), (2L, Long.MaxValue)).toDF("x", "y")
    val e2 = intercept[IllegalArgumentException] {
      ZOrder.writeZOrderedScaled(wideY, path, "x", "y")
    }
    assert(e2.getMessage.contains("'y'"))
  }

  test("scaleTo16 is monotone and lands in [0, 65536)") {
    val vals = Seq(-500L, -1L, 0L, 1L, 123456L, 999999L)
    val out = vals.toDF("c")
      .select(ZOrder.scaleTo16(col("c"), lit(-500L), lit(999999L)).as("b"))
      .as[Long].collect()
    assert(out.toSeq == out.sorted.toSeq, "bucketing must be monotone")
    assert(out.forall(b => b >= 0L && b <= 65535L))
    assert(out.head == 0L)
  }

  test("writeZOrdered round-trips data and clusters the curve") {
    val path = java.nio.file.Files
      .createTempDirectory("zorder").toString
    val df = spark.range(10000).select(
      (col("id") * 131 % 256).as("x"), (col("id") * 31 % 256).as("y"),
      col("id").as("v"))
    ZOrder.writeZOrdered(df, path, Seq("x", "y"), numFiles = 4)
    val back = spark.read.parquet(path)
    assert(back.count() == 10000L)
    assert(back.agg(sum("v")).as[Long].collect()(0) ==
      df.agg(sum("v")).as[Long].collect()(0))
    // the z expression must NOT land as a data column
    assert(back.columns.sorted.toSeq == Seq("v", "x", "y"))
  }
}
