package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.EngineError.IoError
import graft.sources.{ExampleDataset, Tables}
import graft.sinks.Sinks

class DatasetsSinksSpec extends SparkTestBase {
  import spark.implicits._

  test("Cars dataset: 25 rows, 13 red / 12 green, declared schema " +
    "(reference datasets.rs:40-56, data/csv/cars.csv)") {
    val cars = ExampleDataset.Cars.load(spark)
    // Spark's CSV source always reports nullable=true regardless of the
    // supplied schema — compare names and types (the reference's declared
    // non-null flags can't be enforced by the Spark reader)
    assert(cars.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      ExampleDataset.Cars.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(cars.count() == 25)
    val groups = cars.groupBy("car").count().as[(String, Long)].collect().toMap
    assert(groups == Map("red" -> 13L, "green" -> 12L))
  }

  test("cars timestamps: reference's raw ns values survive as exact µs " +
    "(tests/api/dataframe_tests.rs:63-71; ns->µs lossless for whole seconds)") {
    val first = ExampleDataset.Cars.load(spark).orderBy("time")
      .select(unix_micros(to_timestamp($"time")) * 1000).as[Long].head()
    assert(first == 829310703000000000L) // reference's first raw ns value
  }

  test("cars golden: top speeds sorted (reference datasets.rs:136-167 shape)") {
    val top = ExampleDataset.Cars.load(spark)
      .orderBy($"speed".desc).select("car", "speed").limit(3)
      .as[(String, Double)].collect().toSeq
    assert(top.head._2 == top.map(_._2).max)
  }

  test("csvToParquet materializes and round-trips; missing file errors " +
    "(reference datasets.rs:60-120, :227-244)") {
    val path = ExampleDataset.csvToParquet(spark, "data/csv/cars.csv")
    val back = spark.read.parquet(path.toString)
    assert(back.count() == 25)
    val e = intercept[IoError](ExampleDataset.csvToParquet(spark, "/nope/missing.csv"))
    assert(e.getMessage == "CSV file does not exist: /nope/missing.csv")
  }

  test("parquet sink round-trip (reference dataframe_tests.rs:586-686)") {
    val dir = Files.createTempDirectory("graft_sink_").resolve("t.parquet")
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Sinks.writeParquet(df, dir.toString)
    assert(spark.read.parquet(dir.toString).count() == 2)
  }

  test("toJsonBytes: JSON array of row objects, nulls omitted " +
    "(reference dataframe.rs:813-823)") {
    val df = Seq((Option(1), "a"), (None, "b")).toDF("id", "v").orderBy(asc_nulls_last("id"))
    val s = new String(Sinks.toJsonBytes(df), "UTF-8")
    assert(s == """[{"id":1,"v":"a"},{"v":"b"}]""")
  }

  test("csvNoHeader names columns column_i like DataFusion") {
    val tmp = Files.createTempFile("graft_nh_", ".csv")
    Files.writeString(tmp, "a;1\nb;2\n")
    val df = Tables.csvNoHeader(spark, tmp.toString)
    assert(df.columns.toSeq == Seq("column_1"))
    assert(df.count() == 2)
  }

  test("writePartitioned: hive layout + partition pruning in the plan") {
    val dir = Files.createTempDirectory("graft_part_").resolve("t")
    val df = Seq((1, "a", 10), (2, "b", 20), (3, "a", 30)).toDF("id", "cat", "v")
    Sinks.writePartitioned(df, dir.toString, Seq("cat"))
    assert(Files.exists(dir.resolve("cat=a")) && Files.exists(dir.resolve("cat=b")))
    val pruned = spark.read.parquet(dir.toString).filter($"cat" === "a")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cat"))
    assert(pruned.count() == 2)
  }

  test("writeClustered: sorted row groups round-trip") {
    val dir = Files.createTempDirectory("graft_clus_").resolve("t")
    val df = spark.range(100).select(($"id" * 37 % 100).as("k"), $"id".as("v"))
    Sinks.writeClustered(df, dir.toString, Seq("k"))
    assert(spark.read.parquet(dir.toString).count() == 100)
  }

  test("writeClustered options thread through: small row groups, " +
      "range-disjoint min/max stanzas per file") {
    val dir = Files.createTempDirectory("graft_clus_opt_").resolve("t")
    val df = spark.range(200000).select(
      pmod(xxhash64($"id"), lit(1000000L)).as("k"), $"id".as("v"))
    Sinks.writeClustered(df.repartitionByRange(2, $"k"), dir.toString,
      Seq("k"), Map("parquet.block.size" -> (256 * 1024).toString))
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val files = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(files.size == 2)
    var totalGroups = 0
    files.foreach { p =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toString), conf))
      try {
        val blocks = r.getFooter.getBlocks.asScala.toSeq
        totalGroups += blocks.size
        // per-file sort => consecutive row groups cover non-overlapping
        // key ranges (boundary value aside): that disjointness is what a
        // pushed range predicate prunes with
        val stats = blocks.map(_.getColumns.asScala
          .find(_.getPath.toDotString == "k").get.getStatistics)
        val mins = stats.map(_.genericGetMin.toString.toLong)
        val maxs = stats.map(_.genericGetMax.toString.toLong)
        maxs.init.zip(mins.tail).foreach { case (hi, lo) =>
          assert(hi <= lo,
            s"row groups overlap on k: max $hi above next min $lo")
        }
      } finally r.close()
    }
    assert(totalGroups > files.size,
      s"small parquet.block.size must yield several row groups per " +
        s"file, got $totalGroups across ${files.size} files")
  }

  test("schema evolution: one mergeSchema scan reconciles parquet " +
      "generations, null-back-filling columns v1 files never had") {
    val dir = Files.createTempDirectory("graft_evolve_t_").resolve("d")
    Seq((1L, "a"), (2L, "b")).toDF("id", "t")
      .write.parquet(s"$dir/v1")
    Seq((3L, "c", 30L)).toDF("id", "t", "n")
      .write.parquet(s"$dir/v2")
    val m = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/v1", s"$dir/v2")
    assert(m.columns.sorted.toSeq == Seq("id", "n", "t"))
    assert(m.filter($"n".isNull).count() == 2, "v1 rows surface NULL n")
    assert(m.agg(sum($"n")).head().getLong(0) == 30L)
    assert(m.count() == 3)
  }

  test("JSONL sink/source round-trip survives newlines, quotes, " +
      "unicode, and nulls; schema is the explicit one") {
    val dir = Files.createTempDirectory("graft_jsonl_").resolve("d")
    val df = Seq(
      (1L, "line one\nline two\ttabbed", Option("en")),
      (2L, "\"quoted\" and \\backslashed\\", Option("de")),
      (3L, "unicode: café 日本語 😀", None),
      (4L, "", Option("zh")))
      .toDF("doc_id", "text", "lang")
    Sinks.writeJsonl(df, dir.toString)
    val back = Tables.jsonl(spark, dir.toString, df.schema)
    // explicit schema, no inference (JSON relaxes nullability — any
    // line may omit any field — so compare names and types)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val orig = df.collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.getString(2)))).sortBy(_._1)
    val rt = back.collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.getString(2)))).sortBy(_._1)
    assert(rt.toSeq == orig.toSeq,
      "JSONL round trip must be byte-faithful per field")
    // the embedded newline is ESCAPED, not literal: each row is one
    // physical line, which is what keeps the format splittable
    import scala.jdk.CollectionConverters._
    val lines = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .filter(_.nonEmpty).toSeq
    assert(lines.size == 4, s"expected 4 physical lines, got $lines")
  }

  test("S3 conf helper applies reference constants (config-only)") {
    Sinks.S3.configure(spark, Some("eu-west-1"))
    val conf = spark.sparkContext.hadoopConfiguration
    assert(conf.get("fs.s3a.attempts.maximum") == "10")
    assert(conf.get("fs.s3a.multipart.size") == (10L * 1024 * 1024).toString)
    assert(conf.get("fs.s3a.max.total.tasks") == "10")
  }
}
