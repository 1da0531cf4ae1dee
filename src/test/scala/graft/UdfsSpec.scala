package graft

import org.apache.spark.sql.functions._

import graft.functions.Udfs

class UdfsSpec extends SparkTestBase {
  import spark.implicits._

  test("splitText: first segment, null-safe (reference udf.rs:17-59)") {
    val df = Seq("file.txt", "archive.tar.gz", null).toDF("name")
    val out = df.select(Udfs.splitText($"name")).as[String].collect()
    assert(out.toSeq == Seq("file", "archive", null))
  }

  test("splitExt: last segment (reference udf.rs:62-108)") {
    val df = Seq("file.txt", "archive.tar.gz").toDF("name")
    val out = df.select(Udfs.splitExt($"name")).as[String].collect()
    assert(out.toSeq == Seq("txt", "gz"))
  }

  test("SQL registration: select split_text(name) (reference udf.rs:96-105)") {
    Udfs.registerAll(spark)
    Seq((1, "doc.pdf"), (2, "img.png")).toDF("id", "name")
      .createOrReplaceTempView("files")
    val out = spark.sql("select id, split_text(name) as base from files order by id")
      .as[(Int, String)].collect()
    assert(out.toSeq == Seq((1, "doc"), (2, "img")))
  }

  test("splitRow parses city;temp into struct, null-tolerant (1BRC)") {
    val df = Seq("Hamburg;12.0", "Bulawayo;8.9", "bad;x;y", "solo", null)
      .toDF("column_1")
    val out = df.select(Udfs.splitRow($"column_1").as("r"))
      .select($"r.city", $"r.temperature")
      .collect()
    assert(out(0).getString(0) == "Hamburg" && out(0).getDouble(1) == 12.0)
    assert(out(1).getString(0) == "Bulawayo" && out(1).getDouble(1) == 8.9)
    assert(out(2).isNullAt(0) && out(2).isNullAt(1)) // 3 segments -> null fields
    assert(out(3).getString(0) == "solo" && out(3).isNullAt(1))
    assert(out(4).isNullAt(0) && out(4).isNullAt(1)) // null input -> null row
  }
}
