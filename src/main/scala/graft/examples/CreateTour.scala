package graft.examples

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.convert.Convert
import graft.core.Sessions

/** The reference's `examples/dataframe/create.rs` construction patterns
  * (SURVEY fixtures §4): explicit schemas, struct-in-schema, struct
  * literals, list columns with null lists/elements, binary columns and
  * case-class bridges. `sbt "runMain graft.examples.CreateTour"`. */
object CreateTour {
  case class Foo(id: Option[Int], name: Option[String], data: Option[Array[Byte]])

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-create-tour")
    import spark.implicits._

    println("== explicit schema + rows (reference create.rs:19-37) ==")
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1, "foo"), Row(2, "bar"), Row(3, null)),
      schema)
    df.show()

    println("== struct-in-schema metadata{name,data,new} (create.rs:139-167) ==")
    val meta = StructType(Seq(StructField("name", StringType),
      StructField("data", IntegerType), StructField("new", IntegerType)))
    val nested = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, Row("foo", 42, 0)), Row(2, Row("bar", 43, 1))),
      StructType(Seq(StructField("id", IntegerType),
        StructField("metadata", meta))))
    nested.select($"id", $"metadata.name", $"metadata.new").show()

    println("== struct literal column {x,y,z} (create.rs:182-213) ==")
    df.withColumn("s", struct(lit(true).as("x"), lit(1).as("y"),
      lit("z").as("z"))).show(2, truncate = false)

    println("== list column with null list and null elements (create.rs:220-247) ==")
    val lists = Seq(Some(Seq(Some(0), Some(1), Some(2))), None,
      Some(Seq(Some(3), None, Some(4)))).toDF("list")
    lists.show(truncate = false)
    println(graft.operators.GoldenTable.render(lists))

    println("== binary column + case-class bridge (deserialize_to_struct.rs) ==")
    val foos = Seq(Foo(Some(1), Some("foo"), Some(Array[Byte](1, 2, 3))),
      Foo(None, None, None))
    val fooDf = Convert.toDf(spark, foos)
    fooDf.printSchema()
    println(Convert.toStructs[Foo](fooDf).map(f =>
      s"Foo(${f.id},${f.name},${f.data.map(_.length)})").mkString(" | "))

    spark.stop()
    println("CreateTour done.")
  }
}
