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
