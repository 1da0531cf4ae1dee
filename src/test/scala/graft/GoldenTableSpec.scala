package graft

import graft.operators.{ColumnAppend, GoldenTable}
import graft.sources.ExampleDataset

class GoldenTableSpec extends SparkTestBase {
  import spark.implicits._

  test("renders arrow-style table: empty-cell nulls, bordered") {
    val df = Seq((Some(1), "foo"), (None, "bar")).toDF("id", "name")
    val out = GoldenTable.render(df.orderBy(org.apache.spark.sql.functions
      .asc_nulls_last("id")))
    assert(out ==
      """+----+------+
        #| id | name |
        #+----+------+
        #| 1  | foo  |
        #|    | bar  |
        #+----+------+""".stripMargin('#'))
  }

  test("list nulls render like arrow: [3, , 4]") {
    val df = Seq(Tuple1(Seq(Some(3), None, Some(4)))).toDF("nums")
    assert(GoldenTable.render(df).contains("[3, , 4]"))
  }

  test("cars dfSql golden (reference df_sql doctest shape, dataframe.rs:39-61)") {
    val cars = ExampleDataset.Cars.load(spark)
    val top = graft.operators.DataFrameOps
      .dfSql(cars, "speed > 21.0 and car in ('red','green')")
      .orderBy($"speed".desc).select("car", "speed")
    assert(GoldenTable.matches(top,
      """+-----+-------+
        || car | speed |
        |+-----+-------+
        || red | 21.5  |
        || red | 21.4  |
        |+-----+-------+""".stripMargin))
  }

  test("golden holds through positional append (tests/api shape)") {
    val small = ExampleDataset.Cars.load(spark)
      .orderBy("time").limit(2).select("car", "speed")
    val out = ColumnAppend.addPk(small, "pk")
    assert(GoldenTable.render(out) ==
      """+-------+-------+----+
        || car   | speed | pk |
        |+-------+-------+----+
        || red   | 20.0  | 0  |
        || green | 10.0  | 1  |
        |+-------+-------+----+""".stripMargin)
  }
}
