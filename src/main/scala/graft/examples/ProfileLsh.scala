package graft.examples

import graft.core.Sessions
import graft.operators.Dedup
import graft.sources.Tables

/** Is dd_embed_lsh compile-bound or execution-bound? Run it twice. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("profile-lsh", Some("local[32]"), Some(32))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = Tables.load(spark, dir, "embeddings")
    e.count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = Dedup.embeddingPairs(e, "vec_id", "embedding",
        threshold = 0.3, tables = 8, bits = 8).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%6.2fs pairs=$n")
    }
    val t0 = System.nanoTime()
    Dedup.embeddingBuckets(e, "vec_id", "embedding", 8, 8).count()
    println(f"buckets only: ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    spark.stop()
  }
}
