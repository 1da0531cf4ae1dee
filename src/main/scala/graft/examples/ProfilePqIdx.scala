package graft.examples

import graft.operators.Similarity
import graft.core.Sessions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Where do sim_topk_pq_idx's seconds go — encode, write, bloom, read,
  * or probe? Run each leg twice (JIT/compile vs steady). */
object ProfilePqIdx {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("profile-pqidx", Some("local[32]"), Some(32))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = Tables.load(spark, dir, "embeddings")
    e.count()
    val books = Similarity.pqTrain(e, "vec_id", "embedding",
      m = 4, ksub = 8, iters = 2)
    val booksRows = books.collect()
    val booksDf = spark.createDataFrame(
      java.util.Arrays.asList(booksRows: _*), books.schema)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    for (i <- 1 to 2) {
      val path = s"/tmp/graft_profile_pq_$i"
      t(s"run$i encode.count") {
        Similarity.pqEncode(e, "vec_id", "embedding", booksDf).count()
      }
      t(s"run$i writePqIndex") {
        Similarity.writePqIndex(e, "vec_id", "embedding", booksDf, path,
          sourceTag = dir)
      }
      val idx = t(s"run$i readPqIndex") {
        Similarity.readPqIndex(spark, path, expectedSource = Some(dir))
      }
      t(s"run$i pqTopK") {
        Similarity.pqTopK(
          e.repartition(32, col("vec_id")), e, "vec_id", "embedding",
          idx.books, k = 5, prebuiltCodes = Some(idx.codes))
          .orderBy("query_id", "neighbor_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
