package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{ColumnAppend, GoldenTable}
import graft.sources.ExampleDataset

/** The reference test-matrix corners that had no direct Scala twin:
  * LargeUtf8 appends, raw nanosecond timestamp values, and the arrow
  * null-list/struct golden rendering — each pinned against the exact
  * values/goldens in the reference tests cited per case.
  */
class ReferenceCornersSpec extends SparkTestBase {
  import spark.implicits._

  test("Utf8 + LargeUtf8 string appends (reference helpers_tests.rs:217-246)") {
    // Arrow distinguishes Utf8 (32-bit offsets) from LargeUtf8 (64-bit);
    // Spark's StringType subsumes both — a LargeStringArray input maps to
    // the same column type. The behavioral contract carried over is the
    // reference's: 5 columns, 25 rows, and the golden block values.
    val cars = ExampleDataset.Cars.load(spark)
    val df = ColumnAppend.addStrColumn(cars, "col1", Seq.fill(25)("foo"))
    val out = ColumnAppend.addStrColumn(df, "col2", Seq.fill(25)("bar"))
    assert(out.schema.fields.length == 5) // columns count
    assert(out.count() == 25)             // rows count
    // the reference's sort is by car only and stable (file order within
    // group); time ascending reproduces that order deterministically
    val sorted = out.orderBy("car", "time").limit(6)
    assert(GoldenTable.matches(sorted,
      """+-------+-------+---------------------+------+------+
        || car   | speed | time                | col1 | col2 |
        |+-------+-------+---------------------+------+------+
        || green | 10.0  | 1996-04-12T12:05:03 | foo  | bar  |
        || green | 10.3  | 1996-04-12T12:05:04 | foo  | bar  |
        || green | 10.4  | 1996-04-12T12:05:05 | foo  | bar  |
        || green | 10.5  | 1996-04-12T12:05:06 | foo  | bar  |
        || green | 11.0  | 1996-04-12T12:05:07 | foo  | bar  |
        || green | 12.0  | 1996-04-12T12:05:08 | foo  | bar  |
        |+-------+-------+---------------------+------+------+""".stripMargin))
  }

  test("raw nanosecond timestamp values (reference dataframe_tests.rs:45-71)") {
    // The reference reads the cars timestamps as TimestampNanosecondArray
    // and asserts the raw i64 ns values. Spark timestamps are µs; the cars
    // times are whole seconds, so µs -> ns is exact — assert the same raw
    // sequence the reference pins.
    val cars = ExampleDataset.Cars.load(spark)
    val got = cars.select(col("speed"),
        (unix_micros(col("time").cast("timestamp")) * 1000L).as("ns"))
      .as[(Double, Long)].collect().toSeq
    val speeds = Seq(20.0, 20.3, 21.4, 21.5, 19.0, 18.0, 17.0, 7.0, 7.1,
      7.2, 3.0, 1.0, 0.0, 10.0, 10.3, 10.4, 10.5, 11.0, 12.0, 14.0, 15.0,
      15.1, 15.2, 8.0, 2.0)
    val ns = ((0 to 12) ++ (0 to 11)).map(i =>
      (829310703L + i) * 1000000000L)
    assert(got.map(_._1) == speeds)
    assert(got.map(_._2) == ns)
  }

  test("arrow null-list + struct golden (reference dataframe_tests.rs:688-745)") {
    val base = ExampleDataset.Cars.load(spark).limit(3).orderBy("speed")
    val out = ColumnAppend.addColumns(base, Seq(
      ("col0", Seq(10, 100, 1000), IntegerType),
      ("col1", Seq("foo", "bar", "baz"), StringType),
      ("col2", Seq(42.0, 43.0, 44.0), DoubleType),
      ("col3", Seq(true, null, false), BooleanType),
      ("col4", Seq(null, null, null), ArrayType(IntegerType)),
      ("col5", Seq(Seq(0, 1, 2), null, Seq(3, null, 4)),
        ArrayType(IntegerType)),
      ("col6", Seq(Row("foo", 42), Row("bar", 43), Row("baz", 44)),
        StructType(Seq(StructField("a", StringType),
          StructField("b", IntegerType))))))
    assert(GoldenTable.matches(out,
      """+-----+-------+---------------------+------+------+------+-------+------+-----------+-----------------+
        || car | speed | time                | col0 | col1 | col2 | col3  | col4 | col5      | col6            |
        |+-----+-------+---------------------+------+------+------+-------+------+-----------+-----------------+
        || red | 20.0  | 1996-04-12T12:05:03 | 10   | foo  | 42.0 | true  |      | [0, 1, 2] | {a: foo, b: 42} |
        || red | 20.3  | 1996-04-12T12:05:04 | 100  | bar  | 43.0 |       |      |           | {a: bar, b: 43} |
        || red | 21.4  | 1996-04-12T12:05:05 | 1000 | baz  | 44.0 | false |      | [3, , 4]  | {a: baz, b: 44} |
        |+-----+-------+---------------------+------+------+------+-------+------+-----------+-----------------+""".stripMargin))
  }
}
