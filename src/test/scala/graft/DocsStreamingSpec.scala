package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.streaming.DocsStreaming

/** Streaming ingest (DocsStreaming): gate → intra-stream content dedup →
  * landed-corpus probe, pinned EQUAL to the batch twins on the same
  * data — the streaming path must land exactly the rows the batch
  * curation chain would have kept. */
class DocsStreamingSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  // passes the default quality gate (length band 10..10000 tokens,
  // stopwords, alpha density) and the "en" language gate
  private def goodText(tag: String): String =
    s"the quick brown fox $tag jumps over the lazy dog and runs far away"

  test("contentDedup: intra-stream keep-first plus landed-corpus drop, " +
      "equal to the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((100L, goodText("landed"))).toDF("doc_id", "text")
    val idx = DocsStreaming.corpusHashIndex(corpus, "text")
      .localCheckpoint() // static side: materialized once per drop cycle
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val out = DocsStreaming.contentDedup(docs, Some(idx))
    val q = out.writeStream.format("memory").queryName("cd_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, t0, goodText("a")),
        (2L, t0, goodText("a")),      // intra-batch duplicate of 1
        (3L, t0, goodText("landed")), // already in the corpus
        (4L, t0, goodText("b")))
      q.processAllAvailable()
      mem.addData((5L, t0, goodText("a"))) // still within watermark
      q.processAllAvailable()
      val got = spark.sql("select doc_id from cd_test order by 1")
        .as[Long].collect().toSeq
      assert(got == Seq(1L, 4L))
      // batch twin on the same rows: exact keep-first among arrivals
      // minus anything whose hash is landed — identical survivor set
      val arrivals = Seq((1L, goodText("a")), (2L, goodText("a")),
        (3L, goodText("landed")), (4L, goodText("b")),
        (5L, goodText("a"))).toDF("doc_id", "text")
      val batch = Dedup.exactByContent(arrivals, "doc_id", "text")
        .join(idx.withColumn("__c", lit(1)), Seq("content_hash"), "left")
        .filter(col("__c").isNull)
        .select("doc_id").as[Long].collect().toSeq.sorted
      assert(batch == got)
    } finally q.stop()
  }

  test("ingest: quality and language gates drop before dedup state, " +
      "token accounting stamped on survivors") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val out = DocsStreaming.ingest(docs, corpusHashes = None)
    val q = out.writeStream.format("memory").queryName("ingest_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, t0, goodText("x")),
        (2L, t0, "short junk"),            // fails the length band
        (3L, t0, goodText("x")),           // duplicate of 1
        (4L, t0, goodText("y")))
      q.processAllAvailable()
      val rows = spark.sql(
        "select doc_id, n_tokens, n_tokens_est from ingest_test order by 1")
        .collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 4L))
      // exact whitespace token count of goodText = 14
      assert(rows.forall(_.getInt(1) == 14))
      assert(rows.forall(_.getInt(2) > 0))
      // the gates are the SAME Column expressions the batch side runs —
      // pin one value so a gate drift breaks here too
      val s = Seq(goodText("x")).toDF("text")
        .select(TextAnalysis.qualityScore(col("text"))).head().getDouble(0)
      assert(s >= 0.5, s"quality gate fixture drifted: $s")
    } finally q.stop()
  }
}
