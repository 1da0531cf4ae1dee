package graft

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventsStreaming

class StreamingFileSourceSpec extends SparkTestBase {

  test("file-source stream over events parquet: watermarked hourly aggregate " +
    "matches the batch answer") {
    // stage the real events table (ns ts normalized to µs by Tables.load)
    // as a stream-source directory
    val dir = Files.createTempDirectory("graft_stream_src_")
    val batchEvents = Tables.load(spark, "/root/testdata/sf0.001", "events")
    batchEvents.write.mode("overwrite").parquet(dir.toString)

    val streamed = EventsStreaming.fromParquetDir(spark, dir.toString,
      batchEvents.schema)
    val agg = EventsStreaming.hourlyAggregates(streamed, "2 hours", "1 hour")
    val q = agg.writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamedRows = spark.sql(
        "select sum(cnt) as n, count(*) as groups from file_hourly").collect()(0)
      val batchGroups = batchEvents
        .groupBy(window(col("ts"), "1 hour"), col("event_type")).count()
      assert(streamedRows.getLong(0) == batchEvents.count())
      assert(streamedRows.getLong(1) == batchGroups.count())
    } finally q.stop()
  }
}
