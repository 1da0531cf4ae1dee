package graft.examples

import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.functions.Udfs
import graft.sources.Tables

/** The reference's `examples/algo` group re-expressed on the testdata
  * tables: 1BRC aggregation, scalar-subquery least-values, round-robin
  * assignment, random sampling. `sbt "runMain graft.examples.AlgoTour"`.
  */
object AlgoTour {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-algo-tour")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Tables.registerAll(spark, dir)
    Udfs.registerAll(spark)

    println("== 1BRC: struct-UDF parse + min/max/median GROUP BY ==")
    spark.sql("""
      WITH raw AS (
        SELECT concat(event_type, ';', CAST(value AS STRING)) AS column_1
        FROM events),
      parsed AS (SELECT split_row(column_1) AS r FROM raw)
      SELECT r.city AS city, min(r.temperature) AS t_min,
             max(r.temperature) AS t_max, median(r.temperature) AS t_med
      FROM parsed GROUP BY city ORDER BY city LIMIT 100""").show()

    println("== least values: scalar subquery predicate ==")
    spark.sql("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                 WHERE o_custkey = (SELECT min(o_custkey) FROM orders)
                   AND 1 = 1
                 ORDER BY o_orderkey""").show(5)

    println("== round robin over (SELECT count(*) FROM region) workers ==")
    spark.sql("""SELECT o_orderkey,
                   ((o_orderkey - 1) % (SELECT count(*) FROM region)) + 1
                     AS worker
                 FROM orders ORDER BY o_orderkey""").show(5)

    println("== random sampling: ORDER BY random() LIMIT 1 ==")
    spark.sql("SELECT r_regionkey, r_name FROM region ORDER BY rand() LIMIT 1")
      .show()

    spark.stop()
    println("AlgoTour done.")
  }
}
