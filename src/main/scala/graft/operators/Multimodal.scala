package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata alongside.
  *
  * The Spark-side plumbing is real — schema, encoders, per-partition batch
  * shape, pushdown-friendly metadata projection. The actual media decode is
  * STUBBED (`StubCodec`): this container has no image/audio libraries, so
  * the codec derives deterministic fake dimensions from the bytes. Swapping
  * in a real JNI/ffmpeg decoder changes only `StubCodec.decode`.
  *
  * Scale notes: decode runs via `mapPartitions`, so codec init happens once
  * per partition (not per row), and `spark.sql.files.maxPartitionBytes`
  * bounds the bytes a task holds. Metadata-only queries never touch the
  * binary column — parquet column pruning skips the heavy bytes entirely.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Long, width: Int, height: Int, first_byte: Int)
  case class FrameMeta(doc_id: Long, frame_idx: Long, frame_off: Long)

  /** Deterministic fake decode: stands in for an image decoder. A real
    * implementation would replace only this object. */
  object StubCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val len = bytes.length
      val first = if (len > 0) bytes(0) & 0xff else 0
      // fake dims, stable functions of the payload
      val width = 1 + (len % 640)
      val height = 1 + ((len * 7) % 480)
      (width, height, first)
    }
  }

  /** Attach a binary payload column derived from text (the test corpus has
    * no real media; UTF-8 bytes stand in for image bytes). */
  def withPayload(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), encode(col(textCol), "UTF-8").as("payload"))

  /** Frame sampling: the 1→N decode shape (video → frames, audio →
    * windows). The stub derives a deterministic frame count (1 + len % 4)
    * and byte offsets from the payload; a real decoder swaps into the same
    * flatMap. Output rows are small typed metadata — the heavy payload
    * bytes never leave the task that decoded them. */
  def sampleFrames(media: DataFrame)(implicit spark: SparkSession): Dataset[FrameMeta] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { row =>
      val len = row.payload.length.toLong
      val frames = 1 + (len % 4)
      (0L until frames).map(i => FrameMeta(row.doc_id, i, i * (len / frames)))
    }
  }

  /** Decode metadata per payload via mapPartitions — the per-partition
    * iterator is the batch: codec state initializes once per task. */
  def decodeMeta(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition codec init would go here (JNI handles, buffers, ...)
      it.map { row =>
        val (w, h, first) = StubCodec.decode(row.payload)
        MediaMeta(row.doc_id, row.payload.length.toLong, w, h, first)
      }
    }
  }
}
