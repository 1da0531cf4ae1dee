package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * travel as opaque `binary` columns with typed metadata structs, and
  * decode/feature-extract runs batch-wise inside `mapPartitions`.
  *
  * The Spark-side mechanics here — schema shape, per-partition batched
  * iteration, deterministic partitioning, no driver materialization — are
  * real and tested. The actual media decoding is STUBBED (this container
  * has no image/audio codecs): [[decodeStub]] derives deterministic fake
  * dimensions/features from the payload bytes. Swap `decodeStub` for a
  * real codec (JNI/javacv) without touching any of the plumbing.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("byte_len", LongType),
    StructField("checksum", StringType)))

  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
                           width: Int, height: Int, n_frames: Int,
                           feature: Array[Float])

  /** Attach a binary payload column + metadata struct. In production the
    * payload arrives from parquet/object storage; here any source column
    * castable to binary works (the tests feed text bytes). */
  def attachPayload(df: DataFrame, srcCol: String,
                    mediaType: String = "image/png"): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("checksum")))

  /** STUB decode: deterministic pseudo-dimensions/features derived from
    * the md5 of the payload (the same checksum `attachPayload` records in
    * `media_meta`) — so the stub's outputs are value-verifiable by any
    * engine with md5: with h = first 8 md5 hex chars as an unsigned int,
    * width = 64 + h % 512, height = 64 + (h / 7) % 512,
    * n_frames = video ? 1 + h % 32 : 1. A real implementation decodes the
    * image/audio here — the signature and batching contract are what
    * production code keeps. */
  private[operators] def decodeStub(id: Long, mediaType: String,
                                    payload: Array[Byte]): MediaFeatures = {
    val len = payload.length.toLong
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(payload)
    val h = ((digest(0) & 0xFFL) << 24) | ((digest(1) & 0xFFL) << 16) |
      ((digest(2) & 0xFFL) << 8) | (digest(3) & 0xFFL)
    val feat = Array.tabulate(8)(i =>
      ((h >>> (i * 4)) & 0xF).toFloat / 15.0f)
    MediaFeatures(id, mediaType, len,
      width = (64 + h % 512).toInt,
      height = (64 + (h / 7) % 512).toInt,
      n_frames = if (mediaType.startsWith("video")) (1 + h % 32).toInt else 1,
      feature = feat)
  }

  /** Batch-wise featurization over partitions: pulls (id, type, payload)
    * in fixed-size batches — the same shape a vectorized (Arrow/pandas)
    * UDF has — so a real decoder can amortize model/codec init per batch
    * and per partition, not per row. Runs fully distributed.
    */
  def featurize(df: DataFrame, idCol: String = "doc_id",
                batchSize: Int = 64): Dataset[MediaFeatures] = {
    val input = df.select(col(idCol).cast("long"),
      col("media_meta.media_type"), col("payload"))
    implicit val enc = Encoders.product[MediaFeatures]
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch init point for a real codec/model goes here
        batch.iterator.map { r: Row =>
          decodeStub(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
        }
      }
    }
  }

  /** Deterministic frame sampling plan for video payloads: every k-th
    * frame index, computed as a lazy column op (no decode needed to plan). */
  def frameSamplePlan(df: DataFrame, nFramesCol: String, every: Int = 10): DataFrame =
    df.withColumn("sampled_frames",
      filter(sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0))),
        i => i % every === 0))

  /** Resize spec: target box preserving aspect ratio — metadata-only op
    * that a downstream decode stage consumes. */
  def resizePlan(df: DataFrame, wCol: String, hCol: String,
                 maxSide: Int = 256): DataFrame = {
    val scale = least(lit(maxSide) / col(wCol), lit(maxSide) / col(hCol),
      lit(1.0))
    df.withColumn("target_w", ceil(col(wCol) * scale).cast("int"))
      .withColumn("target_h", ceil(col(hCol) * scale).cast("int"))
  }
}
