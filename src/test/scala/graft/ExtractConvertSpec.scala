package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.convert.Convert
import graft.operators.Extract

case class Foo(id: Option[Int], name: Option[String], data: Option[Array[Byte]])
case class Bar(id: Int, name: String)

class ExtractConvertSpec extends SparkTestBase {
  import spark.implicits._

  test("columnValues extracts typed host values") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    assert(Extract.columnValues[Int](df.orderBy("id"), "id") == Seq(1, 2))
    assert(Extract.columnValues[String](df.orderBy("id"), "v") == Seq("a", "b"))
  }

  test("structValues: null row -> empty seq, null field -> \"null\" " +
    "(reference helpers.rs:546-576)") {
    val df = Seq((1, Some(("x", Option(10)))), (2, Some(("y", None: Option[Int]))),
      (3, None: Option[(String, Option[Int])]))
      .toDF("id", "s").orderBy("id")
    val out = Extract.structValues(df, "s")
    assert(out == Seq(Seq("x", "10"), Seq("y", "null"), Seq()))
  }

  test("valueAt extracts a single element (reference try_from_array)") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v").orderBy("id")
    assert(Extract.valueAt(df, 1, "v") == "b")
    assert(Extract.valueAt(df, 0, "id") == 1)
  }

  test("parseStrings: unparsable -> null; unsigned widens to Long") {
    assert(Extract.parseStrings(Seq("1", "x", "3"), IntegerType) ==
      Seq(1, null, 3))
    assert(Extract.parseStrings(Seq("4294967295"), LongType) == Seq(4294967295L))
    intercept[UnsupportedOperationException](
      Extract.parseStrings(Seq("t"), BooleanType))
  }

  test("parseColumn: distributed cast, bad input -> null") {
    val df = Seq("1", "nope", "3").toDF("v")
    val out = Extract.parseColumn(df, "v", IntegerType)
    assert(out.schema("v").dataType == IntegerType)
    assert(out.collect().map(_.get(0)).toSeq == Seq(1, null, 3))
  }

  test("case-class round trip incl. binary and all-null rows " +
    "(reference deserialize_to_struct.rs)") {
    val in = Seq(
      Foo(Some(1), Some("foo"), Some(Array[Byte](1, 2))),
      Foo(None, None, None))
    val df = Convert.toDf(spark, in)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "data"))
    val back = Convert.toStructs[Foo](df.orderBy(asc_nulls_last("id")))
    assert(back.head.id.contains(1))
    assert(back.head.data.get.toSeq == Seq[Byte](1, 2))
    assert(back(1) == Foo(None, None, None))
  }

  test("toStructsTolerant fills missing columns with nulls " +
    "(reference deserialize_to_struct.rs:125-201)") {
    val df = Seq((1, "foo")).toDF("id", "name") // no `data` column
    val out = Convert.toStructsTolerant[Foo](df)
    assert(out == Seq(Foo(Some(1), Some("foo"), None)))
  }

  test("toDs is lazy and typed") {
    val ds = Convert.toDs[Bar](Seq((1, "a"), (2, "b")).toDF("id", "name"))
    assert(ds.filter(_.id == 2).collect().toSeq == Seq(Bar(2, "b")))
  }
}
