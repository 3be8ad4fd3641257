package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-batches.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (the real
  * codec libraries are not in this container); everything Spark-side is
  * real: schema, binary column handling, batch shape (one decode call
  * per partition batch, the Scala analogue of mapInPandas), and the
  * partitioning contract (media rows are wide — repartition by id hash
  * before the decode stage so batches are uniform).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)
  final case class MediaFeatures(
      doc_id: Long, kind: String, width: Int, height: Int,
      n_bytes: Int, feature: Array[Float])

  /** STUB decode: a real implementation would decode image/audio bytes;
    * this derives deterministic pseudo-metadata + an 8-dim byte-bucket
    * feature from the raw bytes, preserving the exact UDF signature and
    * batch shape a real decoder would use. */
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
    * (doc_id, media binary, kind). */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"), col("kind"))
      .as[MediaRow]
      .mapPartitions { batch =>
        // one-time per-partition setup would open the codec here
        batch.map { row =>
          val (w, h, feat) = decodeStub(row.media)
          MediaFeatures(row.doc_id, row.kind, w, h, row.media.length, feat)
        }
      }
  }

  final case class MediaResized(doc_id: Long, kind: String,
      width: Int, height: Int, media: Array[Byte])

  /** STUB resize: deterministic byte decimation to at most
    * targetW*targetH bytes (stride = ceil(n/cap)); a real
    * implementation would decode, scale, re-encode. The Spark-side
    * contract is the real thing: binary in, binary out, new metadata,
    * one batch call per partition. */
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

  /** Resize over partition batches (same shape as [[extractFeatures]]).
    * Input df needs (doc_id, media binary, kind). */
  def resize(df: DataFrame, targetW: Int, targetH: Int): Dataset[MediaResized] = {
    // fail fast at the driver, not inside an executor task
    require(targetW > 0 && targetH > 0, s"target dims must be positive: ${targetW}x$targetH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"), col("kind")).as[MediaRow]
      .mapPartitions { batch =>
        batch.map { row =>
          MediaResized(row.doc_id, row.kind, targetW, targetH,
            resizeStub(row.media, targetW, targetH))
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

  /** Synthesize a media table from the documents table (binary payload
    * = UTF-8 bytes of the text; deterministic, no external data). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("image"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio"))
        .otherwise(lit("video")).as("kind"))
}
