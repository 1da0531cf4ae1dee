package graft

import graft.core.EngineError.AnalysisError
import graft.operators.ColumnPack._

class ColumnPackSpec extends SparkTestBase {
  import spark.implicits._

  private def idNameData = Seq((1, "foo", 42), (2, "bar", 43), (3, "baz", 44))
    .toDF("id", "name", "data")

  test("colsToJson packs with alphabetically sorted keys and drops sources") {
    // reference golden: {"data":42,"id":1,"name":"foo"}
    // (src/utils/dataframe.rs:1067-1075)
    val out = colsToJson(idNameData, Seq("name", "id", "data"), "new_col")
    assert(out.columns.toSeq == Seq("new_col"))
    val vals = out.as[String].collect().toSeq
    assert(vals == Seq(
      """{"data":42,"id":1,"name":"foo"}""",
      """{"data":43,"id":2,"name":"bar"}""",
      """{"data":44,"id":3,"name":"baz"}"""))
  }

  test("colsToJson omits null fields (reference dataframe.rs:1068)") {
    val df = Seq((Option(1), "foo", 42), (Option(2), "bar", 43), (None, "baz", 44))
      .toDF("id", "name", "data")
    val out = colsToJson(df, Seq("id", "name", "data"), "j").as[String].collect()
    assert(out(2) == """{"data":44,"name":"baz"}""")
  }

  test("colsToJson keeps .0 on doubles (reference doctest :330-355)") {
    val cars = Seq(("red", 20.0), ("green", 15.1)).toDF("car", "speed")
    val out = colsToJson(cars, Seq("speed"), "j").select("j").as[String].collect()
    assert(out(0) == """{"speed":20.0}""")
    assert(out(1) == """{"speed":15.1}""")
  }

  test("colsToJson partial pack keeps unpacked columns") {
    val out = colsToJson(idNameData, Seq("name", "data"), "payload")
    assert(out.columns.toSeq == Seq("id", "payload"))
  }

  test("unknown column errors with reference message") {
    val e = intercept[AnalysisError](colsToJson(idNameData, Seq("nope"), "j"))
    assert(e.getMessage == "column nope not found")
    val e2 = intercept[AnalysisError](colsToStruct(idNameData, Seq("gone"), "s"))
    assert(e2.getMessage == "column gone not found")
  }

  test("colsToStruct packs in caller order (not sorted) and drops sources") {
    val out = colsToStruct(idNameData, Seq("name", "id"), "s")
    assert(out.columns.toSeq == Seq("data", "s"))
    val sf = out.schema("s").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(sf.fieldNames.toSeq == Seq("name", "id"))
    val first = out.select("s.name", "s.id").collect()(0)
    assert(first.getString(0) == "foo" && first.getInt(1) == 1)
  }
}
