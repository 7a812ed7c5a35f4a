package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-column plumbing: images/audio/video travel as opaque
  * `binary` payload columns with a typed metadata struct; decode /
  * feature-extraction runs batched per partition (the Scala analog of
  * `mapInPandas` — one decoder instance per partition, vectorized
  * batches, no per-row setup cost).
  *
  * Two codec paths:
  *   - IMAGES decode for real via the JDK's ImageIO (PNG/BMP — zero
  *     extra dependencies): `decodeImage` reads geometry + mean
  *     channel values from the actual pixel raster, and
  *     `syntheticImageBytes`/`imageTable` generate deterministic
  *     lossless payloads so the decode is golden-testable end to end
  *     (MultimodalSpec).
  *   - audio/video stay STUBBED (no codec libs in this container):
  *     `decodeStub` derives a deterministic fake feature vector from
  *     the payload bytes. The Spark-side plumbing — schema,
  *     partitioning, batch shape, per-partition resource lifecycle —
  *     is real and tested; swapping `decodeStub` for a JNI/FFI codec
  *     is a one-function change.
  */
object Multimodal extends graft.QueryModule {

  /** Opaque media record: payload + typed metadata, as it would land
    * from an object-store manifest at 100 TB. */
  case class MediaRecord(media_id: Long, kind: String, width: Int,
                         height: Int, payload: Array[Byte])

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           mean_byte: Double, head_hash: Long)

  /** Build a deterministic media table from `documents` (payload =
    * utf-8 text bytes standing in for encoded media). */
  def mediaTable(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
      encode(col("text"), "utf-8").as("payload"))
      .as[MediaRecord]
  }

  /** STUB decoder: stands in for an image/audio codec. Deterministic:
    * byte statistics + a rolling hash of the first 16 bytes. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val mean =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    val headHash = bytes.take(16).foldLeft(0L)((a, b) =>
      (a * 31 + (b & 0xff)) % 1000000007L)
    MediaFeatures(r.media_id, r.kind, bytes.length, mean, headHash)
  }

  /** Batched per-partition decode — the mapInPandas-shaped hot path.
    * One iterator pass per partition: decoder init happens once per
    * partition (where a real codec would allocate its context).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder context would be created here
      it.map(decodeStub)
    }
  }

  def featureQuery(s: SparkSession, d: String): DataFrame =
    extractFeatures(mediaTable(Tables.documents(s, d))).toDF()

  /** A resized media record: same payload contract, new target dims +
    * the scale factor a real resampler would apply. */
  case class ResizedRecord(media_id: Long, kind: String, width: Int,
                           height: Int, scale: Double, payload: Array[Byte])

  /** Resize-to-fit: compute the aspect-preserving target geometry
    * (min-scale fit into `maxW`×`maxH`, never upscale) and run the
    * payload through the batched per-partition "resampler" — the STUB
    * truncates the payload proportionally to the area ratio, standing
    * in for a pixel resampler. Geometry math is Column-level
    * (codegen); only the payload transform needs the partition pass.
    */
  def resizeToFit(media: Dataset[MediaRecord], maxW: Int,
                  maxH: Int): Dataset[ResizedRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition resampler context would be created here
      it.map { r =>
        val scale = math.min(1.0,
          math.min(maxW.toDouble / r.width, maxH.toDouble / r.height))
        val w = math.max(1, math.floor(r.width * scale).toInt)
        val h = math.max(1, math.floor(r.height * scale).toInt)
        val keep = math.max(1,
          math.floor(r.payload.length * scale * scale).toInt)
        ResizedRecord(r.media_id, r.kind, w, h, scale,
          r.payload.take(keep))
      }
    }
  }

  /** One sampled video frame: ordinal + byte offset + a fixed-size
    * window of payload bytes standing in for the decoded frame. */
  case class FrameSample(media_id: Long, frame_idx: Int, byte_offset: Int,
                         frame: Array[Byte])

  /** Frame sampling: every `everyN`-th "frame" of video payloads
    * (non-video rows produce no frames — the filter prunes them before
    * any decode work). The STUB treats the payload as fixed-size
    * `frameBytes` chunks; a real codec would seek keyframes. The
    * explode happens inside the partition pass — output rows stream
    * out without materializing all frames of a video in memory.
    */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int,
                   frameBytes: Int = 64): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      // per-partition demuxer context would be created here
      it.flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames by everyN).iterator.map { f =>
          val off = f * frameBytes
          FrameSample(r.media_id, f, off,
            r.payload.slice(off, off + frameBytes))
        }
      }
    }
  }

  // ---- real image codec (JDK ImageIO, PNG/BMP) -------------------------

  case class ImageFeatures(media_id: Long, format: String, width: Int,
                           height: Int, mean_r: Double, mean_g: Double,
                           mean_b: Double, mean_luma: Double)

  /** Deterministic synthetic RGB image encoded with ImageIO — pixel
    * (x, y) of image `seed` is a fixed affine function of its
    * coordinates, so a test can recompute the exact channel means the
    * decoder must read back (PNG and BMP are both lossless). */
  def syntheticImageBytes(width: Int, height: Int, seed: Long,
                          format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = math.floorMod(x * 7 + y * 3 + seed, 256).toInt
        val g = math.floorMod(x * 5 + y * 11 + seed * 2, 256).toInt
        val b = math.floorMod(x * 13 + y * 17 + seed * 3, 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Media table whose payloads are REAL encoded images: small
    * deterministic PNG (even ids) / BMP (odd ids) rasters derived from
    * the document id. The declared width/height metadata matches the
    * encoded geometry, as an object-store manifest's would. */
  def imageTable(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (id % 13 + 4).toInt
        val h = (id % 9 + 4).toInt
        val fmt = if (id % 2 == 0) "png" else "bmp"
        MediaRecord(id, fmt, w, h, syntheticImageBytes(w, h, id, fmt))
      }
    }
  }

  /** REAL image decode: ImageIO sniffs the container from the bytes
    * (no trust in the metadata columns) and the features come from the
    * decoded pixel raster. */
  def decodeImage(r: MediaRecord): ImageFeatures = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    require(img != null, s"media ${r.media_id}: payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    ImageFeatures(r.media_id, r.kind, w, h, sr.toDouble / n, sg.toDouble / n,
      sb.toDouble / n, (sr + sg + sb).toDouble / (3 * n))
  }

  /** Batched per-partition REAL decode — same shape as
    * `extractFeatures`, but the decoder is the JDK's actual image
    * codec. ImageIO caches its reader SPI lookups per JVM, so the
    * per-partition cost is one stream per record, no per-row codec
    * setup. */
  def extractImageFeatures(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // a pooled/reused ImageReader would be allocated here for a
      // codec that needs per-partition context
      it.map(decodeImage)
    }
  }

  // ---- driver bindings -------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_media_features" -> ((s, d) => featureQuery(s, d))
  )

  /** The stub decode is pure byte arithmetic, so even this op gets a
    * full oracle: utf-8 payload bytes are reproduced in SQL via the
    * text's code units (ASCII corpus). */
  def oracle: Map[String, String] = Map(
    "q40_media_features" -> """
      WITH t AS (
        SELECT doc_id AS media_id,
               ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
               list_transform(string_split(text, ''), c -> ord(c)) AS bytes
        FROM documents)
      SELECT media_id, kind, len(bytes) AS n_bytes,
             CASE WHEN len(bytes) = 0 THEN 0.0
                  ELSE CAST(list_sum(bytes) AS DOUBLE) / len(bytes) END
               AS mean_byte,
             list_reduce(list_prepend(0::BIGINT, list_slice(bytes, 1, 16)),
               (a, b) -> (a * 31 + b) % 1000000007) AS head_hash
      FROM t"""
  )
}
