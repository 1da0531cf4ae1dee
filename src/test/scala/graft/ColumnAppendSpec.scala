package graft

import org.apache.spark.sql.types._

import graft.core.EngineError.AnalysisError
import graft.operators.ColumnAppend._

class ColumnAppendSpec extends SparkTestBase {
  import spark.implicits._

  private def base = Seq((1, "foo"), (2, "bar"), (3, "baz")).toDF("id", "name")

  test("addColumn appends typed values positionally") {
    val out = addColumn(base.orderBy("id"), "data", Seq(10, 100, 1000), IntegerType)
    assert(out.columns.toSeq == Seq("id", "name", "data"))
    assert(out.orderBy("id").select("data").as[Int].collect().toSeq ==
      Seq(10, 100, 1000))
  }

  test("addColumn supports nulls, bools, doubles, lists, structs " +
    "(reference tests/api/dataframe_tests.rs:689-744)") {
    val sorted = base.orderBy("id")
    val b = addColumn(sorted, "flag", Seq(true, null, false), BooleanType)
    assert(b.orderBy("id").collect().map(_.get(2)).toSeq == Seq(true, null, false))

    val d = addColumn(sorted, "speed", Seq(42.0, 43.0, 44.0), DoubleType)
    assert(d.orderBy("id").select("speed").as[Double].collect().toSeq ==
      Seq(42.0, 43.0, 44.0))

    val l = addColumn(sorted, "nums",
      Seq(Seq(0, 1, 2), null, Seq(3, null, 4)), ArrayType(IntegerType))
    val lv = l.orderBy("id").collect().map(_.get(2))
    assert(lv(0) == Seq(0, 1, 2) && lv(1) == null && lv(2) == Seq(3, null, 4))

    val st = StructType(Seq(StructField("a", StringType), StructField("b", IntegerType)))
    val s = addColumn(sorted, "meta",
      Seq(org.apache.spark.sql.Row("x", 1), org.apache.spark.sql.Row("y", 2),
        null), st)
    val sv = s.orderBy("id").select("meta.a").collect().map(_.get(0))
    assert(sv.toSeq == Seq("x", "y", null))
  }

  test("addColumns appends several columns in one pass") {
    val out = addColumns(base.orderBy("id"), Seq(
      ("data", Seq(10, 100, 1000), IntegerType),
      ("tag", Seq("a", "b", "c"), StringType)))
    assert(out.columns.toSeq == Seq("id", "name", "data", "tag"))
    assert(out.orderBy("id").select("tag").as[String].collect().toSeq ==
      Seq("a", "b", "c"))
  }

  test("length mismatch errors with reference message") {
    val e = intercept[AnalysisError](
      addColumn(base, "new_col", Seq(1, 2, 3, 4), IntegerType))
    assert(e.getMessage == "Column 'new_col' has length 4, expected 3")
  }

  test("append to empty frame errors with reference message") {
    val empty = spark.emptyDataFrame
    val e = intercept[AnalysisError](addColumn(empty, "x", Seq(1), IntegerType))
    assert(e.getMessage == "Empty DataFrame")
    val noRows = base.filter($"id" > 99)
    val e2 = intercept[AnalysisError](addColumn(noRows, "x", Seq(), IntegerType))
    assert(e2.getMessage == "Empty DataFrame")
  }

  test("addPk appends sequential 0..n-1 Int32 in current order " +
    "(reference helpers.rs:161-185)") {
    val out = addPk(base.orderBy($"id".desc), "pk")
    assert(out.schema("pk").dataType == IntegerType)
    assert(!out.schema("pk").nullable)
    assert(out.select("id", "pk").as[(Int, Int)].collect().toSeq ==
      Seq((3, 0), (2, 1), (1, 2)))
  }

  test("addAnyColumn rejects unsupported types like the reference") {
    intercept[UnsupportedOperationException](
      addAnyColumn(base, "m", Seq(Map("a" -> 1)), MapType(StringType, IntegerType)))
  }

  test("typed conveniences addIntColumn/addStrColumn") {
    val out = addStrColumn(addIntColumn(base.orderBy("id"), "n", Seq(7, 8, 9)),
      "s", Seq("x", "y", "z"))
    assert(out.columns.toSeq == Seq("id", "name", "n", "s"))
  }
}
