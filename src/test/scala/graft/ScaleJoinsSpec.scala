package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleJoins

class ScaleJoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin returns identical rows to a plain join under skew") {
    // 10k rows of hot key 1 + a tail; dim side of 3 keys
    val left = spark.range(10000).select(lit(1L).as("k"), col("id").as("v"))
      .union(spark.range(100).select((col("id") % 3).as("k"), col("id").as("v")))
    val right = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      .orderBy("k").collect().toSeq
    val salted = ScaleJoins.saltedJoin(left, right, "k", saltFactor = 8)
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = spark.range(1000).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      val dims = spark.range(100).select(col("id").as("k"),
        concat(lit("n"), col("id")).as("name"))
      ScaleJoins.writeBucketed(facts, "graft_facts", "k", buckets = 4)
      ScaleJoins.writeBucketed(dims, "graft_dims", "k", buckets = 4)
      val joined = ScaleJoins.bucketedJoin(spark, "graft_facts", "graft_dims", "k")
      assert(!ScaleJoins.hasShuffleExchange(joined),
        "bucketed join must not shuffle:\n" +
          joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 100)
      // contrast: the same join from plain (unbucketed) frames shuffles
      val plain = facts.join(dims, Seq("k"))
      assert(ScaleJoins.hasShuffleExchange(plain))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_facts")
      spark.sql("DROP TABLE IF EXISTS graft_dims")
    }
  }
}
