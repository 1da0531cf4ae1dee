package graft.examples

import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.operators.Dedup
import graft.sources.Tables

/** Where does simhashPairs time go — fingerprinting or the chunk join? */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("profile-simhash", Some("local[32]"), Some(32))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    time("simhash-fp")(Dedup.simhash(docs, "doc_id", "text").count())
    val fp = Dedup.simhash(docs, "doc_id", "text")
    val chunks = fp.select(col("doc_id"), col("simhash"), posexplode(
      array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "chunk")
    time("chunk-collisions") {
      chunks.groupBy("chunk_idx", "chunk").count()
        .agg(sum(col("count") * col("count"))).collect()(0).getLong(0)
    }
    time("pairs")(Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
    spark.stop()
  }
}
