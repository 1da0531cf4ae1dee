package graft.examples

import org.apache.spark.sql.types.IntegerType

import graft.core.Sessions
import graft.operators.{ColumnAppend, ColumnPack}
import graft.sources.Tables

/** Parity with the reference's three criterion micro-benchmarks
  * (reference `benches/df_cols_to_json.rs:9-26`,
  * `df_cols_to_struct.rs:9-26`, `add_column_to_df.rs:12-28`): identical
  * 3-row inputs, plus scaled variants over the sf tables so regressions
  * show at both extremes. Reports ns/op after warm-up.
  * `sbt "runMain graft.examples.MicroBench"`.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-microbench")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // the reference's 3-row frame: id/name/data (benches/df_cols_to_json.rs:11-15)
    def tiny = Seq((1, "foo", 42), (2, "bar", 43), (3, "baz", 44))
      .toDF("id", "name", "data")

    def bench(name: String, warmup: Int = 3, iters: Int = 10)(f: => Long): Unit = {
      (1 to warmup).foreach(_ => f)
      val t0 = System.nanoTime()
      var rows = 0L
      (1 to iters).foreach(_ => rows = f)
      val perOp = (System.nanoTime() - t0) / iters
      println(f"$name%-28s ${perOp / 1e6}%10.2f ms/op  (rows=$rows)")
    }

    bench("cols_to_json/3rows") {
      ColumnPack.colsToJson(tiny, Seq("id", "name", "data"), "new_col").count()
    }
    bench("cols_to_struct/3rows") {
      ColumnPack.colsToStruct(tiny, Seq("id", "name", "data"), "new_col").count()
    }
    bench("add_column/3rows") {
      ColumnAppend.addColumn(tiny, "new_col", Seq(10, 100, 1000), IntegerType)
        .count()
    }

    val docs = Tables.load(spark, dir, "documents").cache()
    val n = docs.count()
    bench(s"cols_to_json/docs($n)") {
      ColumnPack.colsToJson(docs, Seq("lang", "source", "n_chars"), "j").count()
    }
    bench(s"cols_to_struct/docs($n)") {
      ColumnPack.colsToStruct(docs, Seq("lang", "source", "n_chars"), "s").count()
    }
    spark.stop()
  }
}
