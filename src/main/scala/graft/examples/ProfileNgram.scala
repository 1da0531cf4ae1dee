package graft.examples

import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.operators.Dedup
import graft.sources.Tables

/** Ad-hoc stage profiler for the ngram dedup pipeline. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("profile", Some("local[32]"), Some(32))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    docs.count() // warm
    time("shingles")(Dedup.shingles(docs, "doc_id", "text", 3).count())
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    time("sizes")(sh.groupBy("doc_id").agg(count(lit(1))).count())
    val l = sh.select(col("shingle"), col("doc_id").as("id_a"))
    val r = sh.select(col("shingle"), col("doc_id").as("id_b"))
    time("join+group")(l.join(r, "shingle").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1))).count())
    time("full_pairs")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8, 3).count())
    spark.stop()
  }
}
