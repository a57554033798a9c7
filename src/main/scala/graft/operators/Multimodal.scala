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

  case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** Feature extraction: payload → fixed-dimension embedding, the bridge
    * from the media lane into the Similarity family (the extracted
    * vectors feed `bruteForceTopK`/`buildIvfIndex`/`semDedup` unchanged —
    * spec-pinned composition). The model inference is STUBBED as an
    * L2-normalized byte histogram — deterministic, unit-norm, and
    * sensitive to content like a real encoder's output; a real model
    * swap (ONNX session, JNI) changes only the per-row function and the
    * per-partition init point. Batch shape is the real contract:
    * mapPartitions so model/session state initializes once per task and
    * the payload bytes never leave the task that decoded them — only the
    * d-float vector travels. */
  def extractFeatures(media: DataFrame, dim: Int = 16)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    require(dim >= 1, s"dim must be >= 1: $dim")
    media.as[MediaRow].mapPartitions { it =>
      // per-partition model/session init would go here
      it.map { row =>
        val h = new Array[Float](dim)
        row.payload.foreach(b => h((b & 0xff) % dim) += 1f)
        val norm = math.sqrt(h.foldLeft(0.0)((s, x) => s + x.toDouble * x)).toFloat
        MediaFeatures(row.doc_id,
          if (norm > 0f) h.map(_ / norm) else h)
      }
    }
  }

  /** 64-bit average-hash (aHash) perceptual fingerprint per payload —
    * the media-dedup signal: near-identical images (re-encodes, minor
    * crops) hash within a few bits of each other, and
    * [[perceptualNearDups]] turns that into the keep/drop pair list the
    * same way the text lane's SimHash family does. The "decode +
    * downsample to an 8×8 grayscale grid" step is STUBBED like every
    * codec here: 64 luma samples are drawn at a prime stride over the
    * payload bytes (a real decoder swaps in actual pixel averaging at
    * the same spot); each bit is sample > mean (strict, ×64 integer
    * form — no division). The hash splits into (ph_hi, ph_lo) 32-bit
    * halves so the SQL twin never shifts into the BIGINT sign bit.
    * Empty payloads hash to 0. */
  def perceptualHash(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].map { row =>
      val len = row.payload.length
      val px = Array.tabulate(64)(k =>
        if (len == 0) 0 else row.payload((k * 7919) % len) & 0xff)
      val sum = px.sum.toLong
      var hi = 0L; var lo = 0L
      var k = 0
      while (k < 64) {
        if (px(k).toLong * 64 > sum) {
          if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
        }
        k += 1
      }
      (row.doc_id, hi, lo)
    }.toDF("doc_id", "ph_hi", "ph_lo")
  }

  /** Near-duplicate media pairs at Hamming ≤ `maxDist` over the
    * perceptual hashes — packs the halves back into one long ENGINE-SIDE
    * and rides the text lane's 16-bit chunk banding
    * ([[Dedup.packedHammingPairs]]): pigeonhole-lossless at ≤ 3 bits,
    * candidates-not-cross-products at scale. The oracle twin brute-forces
    * the same pair set from the (hi, lo) halves. */
  def perceptualNearDups(media: DataFrame, maxDist: Int = 3)(
      implicit spark: SparkSession): DataFrame =
    Dedup.packedHammingPairs(
      perceptualHash(media).select(col("doc_id"),
        (shiftleft(col("ph_hi"), 32).bitwiseOR(col("ph_lo"))).as("phash")),
      "doc_id", "phash", maxDist)

  case class ResizePlan(doc_id: Long, width: Int, height: Int,
                        out_w: Int, out_h: Int, scale: Double)

  /** Resize planning: fit each decoded (width, height) into a target box
    * preserving aspect ratio — the metadata half of a resize stage,
    * runnable WITHOUT touching payload bytes (pure arithmetic over
    * `decodeMeta` output, so parquet prunes the binary column). The
    * pixel-pushing half belongs in the same mapPartitions as the decode;
    * splitting plan from execution lets the planner run corpus-wide
    * (e.g. to size output storage) at metadata cost. Never upscales:
    * images already inside the box keep scale 1.0. */
  def resizePlan(meta: Dataset[MediaMeta], maxW: Int, maxH: Int)(
      implicit spark: SparkSession): Dataset[ResizePlan] = {
    import spark.implicits._
    require(maxW >= 1 && maxH >= 1, s"target box must be positive: $maxW x $maxH")
    meta.map { m =>
      val scale = math.min(1.0,
        math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      ResizePlan(m.doc_id, m.width, m.height,
        math.max(1, math.floor(m.width * scale).toInt),
        math.max(1, math.floor(m.height * scale).toInt), scale)
    }
  }
}
