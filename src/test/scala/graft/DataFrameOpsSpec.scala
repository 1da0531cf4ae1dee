package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.EngineError.AnalysisError
import graft.operators.DataFrameOps._

class DataFrameOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def idNameData = Seq((1, "foo", 42), (2, "bar", 43), (3, "baz", 44))
    .toDF("id", "name", "data")

  test("dfSql filters via SQL fragment (reference df_sql doctest)") {
    val cars = graft.sources.ExampleDataset.Cars.load(spark)
    val out = dfSql(cars, "speed > 10 and car in ('red','green')")
    assert(out.count() > 0)
    assert(out.filter($"speed" <= 10).count() == 0)
    val carSet = out.select("car").distinct().as[String].collect().toSet
    assert(carSet.subsetOf(Set("red", "green")))
  }

  test("isEmpty: empty frame true, one-row-relation false (read_empty quirk)") {
    assert(isEmpty(emptyDf(spark)))
    assert(!isEmpty(oneRowRelation(spark)))
    assert(!isEmpty(idNameData))
  }

  test("columnNames: Some for normal frame, None for zero-column schema") {
    assert(columnNames(idNameData).contains(Seq("id", "name", "data")))
    assert(columnNames(emptyDf(spark)).isEmpty)
  }

  test("selectAllExclude drops given cols, silently ignores unknown") {
    val out = selectAllExclude(idNameData, Seq("name", "nonexistent"))
    assert(out.columns.toSeq == Seq("id", "data"))
    assert(out.count() == 3)
  }

  test("concatDfs unions same-schema frames; empty input is an error") {
    val a = Seq((1, "a")).toDF("id", "v")
    val b = Seq((2, "b"), (3, "c")).toDF("id", "v")
    assert(concatDfs(Seq(a, b)).count() == 3)
    val e = intercept[AnalysisError](concatDfs(Seq.empty))
    assert(e.getMessage == "No dataframes provided")
  }

  test("joinDfs folds n frames on shared keys with single key copy") {
    val f1 = Seq((1, 10, "n1"), (2, 20, "n2")).toDF("id", "pk", "name")
    val f2 = Seq((1, 10, 1.5), (2, 20, 2.5)).toDF("id", "pk", "value")
    val f3 = Seq((1, 10, true), (2, 20, false)).toDF("id", "pk", "flag")
    val out = joinDfs(Seq(f1, f2, f3), Seq("id", "pk"))
    assert(out.columns.toSeq == Seq("id", "pk", "name", "value", "flag"))
    assert(out.count() == 2)
  }

  test("join duplicate keys are many-to-many (reference J5 doctest semantics)") {
    val l = Seq((1, "a"), (2, "b"), (2, "c")).toDF("id", "lv")
    val r = Seq((2, "x"), (2, "y"), (3, "z")).toDF("id", "rv")
    assert(joinDfs(Seq(l, r), Seq("id")).count() == 4) // 2 left x 2 right
  }

  test("registerMaterialized snapshots; registerView stays lazy") {
    val df = idNameData
    registerMaterialized(df.filter($"id" <= 2), "mat_snap")
    registerView(df, "lazy_view")
    assert(spark.sql("select * from mat_snap").count() == 2)
    assert(spark.sql("select * from lazy_view").count() == 3)
  }

  test("randomDf yields typed columns named column_i (shape-only, like reference)") {
    val out = randomDf(spark, Seq(IntegerType, FloatType, StringType, BooleanType), 5)
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("column_1", "column_2", "column_3", "column_4"))
    assert(out.schema.fields.map(_.dataType).toSeq ==
      Seq(IntegerType, FloatType, StringType, BooleanType))
    val strs = out.select("column_3").as[String].collect()
    assert(strs.forall(s => s.length >= 1 && s.length <= 50))
  }

  test("withWindowColumns bulk-attaches aliased window exprs (reference W3)") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1, "a", 10), (2, "a", 20), (3, "b", 30)).toDF("id", "g", "v")
    val w = Window.partitionBy("g")
    val out = withWindowColumns(df, Seq(
      count($"id").over(w).as("cnt"), sum($"v").over(w).as("sv")))
    assert(out.columns.toSeq == Seq("id", "g", "v", "cnt", "sv"))
    assert(out.filter($"g" === "a").select("sv").distinct()
      .as[Long].collect().toSeq == Seq(30L))
  }

  test("concatArrays returns column-major host values") {
    val m = concatArrays(idNameData)
    assert(m("id") == Seq(1, 2, 3))
    assert(m("name") == Seq("foo", "bar", "baz"))
  }
}
