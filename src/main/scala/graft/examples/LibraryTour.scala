package graft.examples

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.convert.Convert
import graft.core.Sessions
import graft.functions.Udfs
import graft.operators.{ColumnAppend, ColumnPack, DataFrameOps, Extract}
import graft.sinks.Sinks
import graft.sources.ExampleDataset

/** Runnable tour of the library surface — the analogue of the reference's
  * `examples/{dataframe,udf,algo}` binary groups, driven end-to-end on the
  * cars fixture. `sbt "runMain graft.examples.LibraryTour"`.
  */
object LibraryTour {
  case class CarRow(car: Option[String], speed: Option[Double])

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-library-tour")
    import spark.implicits._

    val cars = ExampleDataset.Cars.load(spark)
    println(s"== cars: ${cars.count()} rows ==")

    println("== dfSql: speed > 10 and car in ('red','green') ==")
    DataFrameOps.dfSql(cars, "speed > 10 and car in ('red','green')")
      .orderBy($"speed".desc).show(5, truncate = false)

    println("== colsToJson(car, speed) ==")
    ColumnPack.colsToJson(cars, Seq("car", "speed"), "new_col")
      .show(3, truncate = false)

    println("== colsToStruct(car, speed) ==")
    ColumnPack.colsToStruct(cars, Seq("car", "speed"), "s")
      .show(3, truncate = false)

    println("== addColumn + addPk (positional) ==")
    val small = cars.orderBy($"time").limit(3).select("car", "speed")
    val appended = ColumnAppend.addPk(
      ColumnAppend.addColumn(small, "label", Seq("a", "b", "c"), StringType), "pk")
    appended.show(truncate = false)

    println("== convert: DataFrame -> case classes -> DataFrame ==")
    val structs = Convert.toStructsTolerant[CarRow](small)
    println(structs.mkString(" | "))
    Convert.toDf(spark, structs).show(truncate = false)

    println("== UDFs: split_text / split_row ==")
    Udfs.registerAll(spark)
    Seq("report.pdf", "notes.txt").toDF("name")
      .select($"name", Udfs.splitText($"name").as("base"),
        Udfs.splitExt($"name").as("ext")).show(truncate = false)
    Seq("Hamburg;12.0", "Oslo;-3.5").toDF("column_1")
      .select(Udfs.splitRow($"column_1").as("r")).select("r.*")
      .show(truncate = false)

    println("== extract: columnValues / structValues ==")
    println(Extract.columnValues[Double](small, "speed"))

    println("== sinks: toJsonBytes ==")
    println(new String(Sinks.toJsonBytes(small), "UTF-8"))

    println("== concat + join utilities ==")
    val red = cars.filter($"car" === "red")
    val green = cars.filter($"car" === "green")
    println(s"union count: ${DataFrameOps.concatDfs(Seq(red, green)).count()}")

    spark.stop()
    println("LibraryTour done.")
  }
}
