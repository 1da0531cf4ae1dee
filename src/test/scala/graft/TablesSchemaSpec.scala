package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** Schema-drift canary: loads every driver-provided table at every scale
  * factor and asserts the POST-LOAD normalized schema. Round 8 broke 9
  * contract queries invisibly when the testdata environment regenerated
  * `events.ts` from TIMESTAMP(NANOS)-as-long to timestamp[us] while the
  * loader hard-coded the old encoding — this spec exists so any future
  * physical-encoding drift fails loudly at `sbt test` instead of at the
  * correctness gate. (The reference pins expected schemas at read the same
  * way, `src/utils/datasets.rs:40-52`.)
  */
class TablesSchemaSpec extends SparkTestBase {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => sf -> s"/root/testdata/$sf")
    .filter { case (_, d) => new java.io.File(d).isDirectory }

  /** column name -> expected Spark type after Tables.load normalization.
    * Matches the driver-generated files (TESTDATA.md): parquet timestamps
    * are written NTZ (isAdjustedToUTC=false) and pass through as
    * TIMESTAMP_NTZ — except `events.ts`, which the loader normalizes to
    * µs TimestampType for the event-time operators. */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  )

  test("testdata directories exist for at least two scale factors") {
    assert(sfDirs.size >= 2, s"only found ${sfDirs.map(_._1)}")
  }

  for ((sf, dir) <- sfDirs; table <- Tables.all) {
    test(s"$sf/$table loads with the normalized schema contract") {
      val got = Tables.load(spark, dir, table).schema
        .map(f => f.name -> f.dataType)
      assert(got == expected(table),
        s"schema drift in $dir/$table.parquet:\n  got      $got\n  expected ${expected(table)}")
    }
  }

  test("events.ts normalizes from every supported physical encoding") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // nanos-as-long (legacy): rebuild µs timestamp
    val legacy = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    val normLegacy = Tables.normalizeEventTs(legacy)
    assert(normLegacy.schema("ts").dataType == TimestampType)
    assert(normLegacy.select(unix_micros($"ts")).head.getLong(0) ==
      1700000000123456L)
    // timestamp_ntz (current files): cast under the UTC session
    val ntz = legacy.select($"event_id",
      timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType).as("ts"))
    val normNtz = Tables.normalizeEventTs(ntz)
    assert(normNtz.schema("ts").dataType == TimestampType)
    assert(normNtz.select(unix_micros($"ts")).head.getLong(0) ==
      1700000000123456L)
    // already-UTC timestamp: identity
    val tz = legacy.select($"event_id",
      timestamp_micros(expr("ts div 1000")).as("ts"))
    assert(Tables.normalizeEventTs(tz).schema("ts").dataType == TimestampType)
    // anything else: loud failure, not silent misread
    val bad = Seq((1L, "oops")).toDF("event_id", "ts")
    val err = intercept[IllegalArgumentException](Tables.normalizeEventTs(bad))
    assert(err.getMessage.contains("unsupported physical type"))
  }
}
