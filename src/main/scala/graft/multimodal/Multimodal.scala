package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-batches.
  *
  * The IMAGE path is real end-to-end (round 6): the fixture synthesizes
  * genuine 24-bit BMP payloads (hand-encoded — fully deterministic and
  * size-predictable for the oracle), and decode/resize run through the
  * JDK's actual `javax.imageio` decoder. Audio/video decode stays a
  * clearly-marked DETERMINISTIC STUB (no audio/video codec libraries in
  * this container); their Spark-side plumbing — schema, binary column
  * handling, batch shape (one decode call per partition batch, the
  * Scala analogue of mapInPandas), partitioning contract — is real.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)
  final case class MediaFeatures(
      doc_id: Long, kind: String, width: Int, height: Int,
      n_bytes: Int, feature: Array[Float])

  // -----------------------------------------------------------------
  // Real image codec path (javax.imageio ships in the JVM).
  // -----------------------------------------------------------------

  /** Deterministic image dims for the synthesized fixture payloads —
    * shared with the oracle SQL (integer arithmetic on doc_id only). */
  def synthBmpDims(docId: Long): (Int, Int) =
    (4 + (docId % 12).toInt, 4 + ((docId * 7) % 10).toInt)

  /** Hand-encoded standard 24-bit BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, bottom-up BGR rows, 4-byte row padding): REAL
    * image bytes — `ImageIO.read` decodes them — with a byte size that
    * is pure integer arithmetic: 54 + h * ((3*w + 3) / 4 * 4). */
  def encodeBmp(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"bmp dims must be positive: ${w}x$h")
    val rowSize = (3 * w + 3) / 4 * 4
    val size = 54 + rowSize * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putInt(0).putInt(54) // reserved, pixel-array offset
    b.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
      .putShort(1).putShort(24)      // planes, bpp
      .putInt(0).putInt(rowSize * h) // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    var y = h - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, bl) = rgb(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowSize - 3 * w
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** Deterministic fixture image for a doc id (dims from
    * [[synthBmpDims]], pixels a fixed integer pattern). */
  def synthBmp(docId: Long): Array[Byte] = {
    val (w, h) = synthBmpDims(docId)
    encodeBmp(w, h, (x, y) => {
      val v = ((x * 7 + y * 13).toLong + docId) % 256
      (v.toInt, (v * 3 % 256).toInt, (v * 5 % 256).toInt)
    })
  }

  /** REAL image decode via the JDK codec: width/height read from the
    * decoded raster, feature = 8-bucket luminance histogram over the
    * decoded pixels. Fails loudly on an undecodable payload. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    val buckets = new Array[Float](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val lum = (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
        buckets(lum >> 5) += 1.0f
        x += 1
      }
      y += 1
    }
    (w, h, buckets)
  }

  /** STUB decode for audio/video (no codec libs in this container): a
    * real implementation would decode the media bytes; this derives
    * deterministic pseudo-metadata + an 8-dim byte-bucket feature from
    * the raw bytes, preserving the exact signature and batch shape a
    * real decoder would use. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = bytes.length
    val width = 64 + (n % 577)
    val height = 64 + ((n * 31) % 431)
    val buckets = new Array[Float](8)
    var i = 0
    while (i < n) { buckets(i % 8) += (bytes(i) & 0xFF) / 255.0f; i += 1 }
    (width, height, buckets)
  }

  /** Feature extraction over partition batches. Input df needs
    * (doc_id, media binary, kind). Images decode through the REAL JDK
    * codec; audio/video through the documented stub. */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"), col("kind"))
      .as[MediaRow]
      .mapPartitions { batch =>
        // one-time per-partition setup would open the a/v codec here
        batch.map { row =>
          val (w, h, feat) =
            if (row.kind == "image") decodeImage(row.media)
            else decodeStub(row.media)
          MediaFeatures(row.doc_id, row.kind, w, h, row.media.length, feat)
        }
      }
  }

  final case class MediaResized(doc_id: Long, kind: String,
      width: Int, height: Int, media: Array[Byte])

  /** STUB resize for audio/video: deterministic byte decimation to at
    * most targetW*targetH bytes (stride = ceil(n/cap)); a real
    * implementation would transcode. */
  def resizeStub(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    require(targetW > 0 && targetH > 0, s"target dims must be positive: ${targetW}x$targetH")
    val cap = targetW * targetH
    if (bytes.length <= cap) bytes
    else {
      val stride = (bytes.length + cap - 1) / cap
      val out = new Array[Byte]((bytes.length + stride - 1) / stride)
      var i = 0; var j = 0
      while (i < bytes.length) { out(j) = bytes(i); j += 1; i += stride }
      out
    }
  }

  /** REAL image resize: JDK decode, deterministic nearest-neighbor
    * sampling (integer source coordinates — no platform-dependent
    * interpolation), re-encode as BMP. Output size is exact integer
    * arithmetic: 54 + targetH * ((3*targetW + 3) / 4 * 4). */
  def resizeImage(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload (${bytes.length} bytes)")
    encodeBmp(targetW, targetH, (x, y) => {
      val p = img.getRGB(x * img.getWidth / targetW, y * img.getHeight / targetH)
      ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
    })
  }

  /** Resize over partition batches (same shape as [[extractFeatures]]).
    * Input df needs (doc_id, media binary, kind): images take the real
    * decode→scale→re-encode path, audio/video the decimation stub. */
  def resize(df: DataFrame, targetW: Int, targetH: Int): Dataset[MediaResized] = {
    // fail fast at the driver, not inside an executor task
    require(targetW > 0 && targetH > 0, s"target dims must be positive: ${targetW}x$targetH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"), col("kind")).as[MediaRow]
      .mapPartitions { batch =>
        batch.map { row =>
          val out =
            if (row.kind == "image") resizeImage(row.media, targetW, targetH)
            else resizeStub(row.media, targetW, targetH)
          MediaResized(row.doc_id, row.kind, targetW, targetH, out)
        }
      }
  }

  final case class MediaFrame(doc_id: Long, frame_idx: Long,
      n_bytes: Int, frame: Array[Byte])

  /** Frame sampling: the one-row-to-many-rows batch shape of a video
    * pipeline. The stub's "frames" are consecutive `frameSize`-byte
    * slices (a real implementation would drive the codec's keyframe
    * iterator); every `everyNth`-th frame is kept, at most `maxFrames`
    * per input row — output per row is BOUNDED by construction, the
    * cap discipline every explode-shaped operator here follows (a
    * pathological 10-hour video cannot blow up a task). Arithmetic is
    * integer-only, so the sampled (doc_id, frame_idx, n_bytes) set is
    * fully oracle-checkable. */
  def sampleFrames(df: DataFrame, frameSize: Int = 16, everyNth: Int = 4,
                   maxFrames: Int = 8): Dataset[MediaFrame] = {
    // fail fast at the driver, not inside an executor task
    require(frameSize > 0 && everyNth > 0 && maxFrames >= 0,
      s"invalid sampling params: frameSize=$frameSize everyNth=$everyNth maxFrames=$maxFrames")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"), col("kind")).as[MediaRow]
      .mapPartitions { batch =>
        batch.flatMap { row =>
          val n = row.media.length
          val nFrames = (n + frameSize - 1) / frameSize
          Iterator.range(0, nFrames, everyNth).take(maxFrames).map { idx =>
            val start = idx * frameSize
            val len = math.min(frameSize, n - start)
            MediaFrame(row.doc_id, idx.toLong, len,
              java.util.Arrays.copyOfRange(row.media, start, start + len))
          }
        }
      }
  }

  /** Synthesize a media table from the documents table — deterministic,
    * no external data. IMAGE rows carry a REAL synthesized BMP payload
    * (the JDK codec decodes it; size integer-predictable from doc_id);
    * audio/video rows carry the UTF-8 bytes of the text (opaque payload
    * for the stub paths). The per-row BMP synthesis is a fixture
    * generator, not an operator — a typed map, not a hot-path UDF. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val bmpUdf = udf((id: Long) => synthBmp(id))
    docs.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, bmpUdf(col("doc_id")))
        .otherwise(encode(col("text"), "UTF-8")).as("media"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("image"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio"))
        .otherwise(lit("video")).as("kind"))
  }
}
