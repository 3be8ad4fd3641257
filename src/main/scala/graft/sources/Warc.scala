package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) record reader — the canonical webtext
  * ingest format (a Common Crawl snapshot ships ~100 TB of WARC). This
  * re-expresses the reference's bulk-download + parse ingest stage
  * (SURVEY.md S1/S2, reference `ftp_downloader.py` / streaming fetch)
  * over the format a web-scale corpus actually arrives in, so the
  * no-egress substitution stops at the fetch itself: everything after
  * the bytes land on disk is real.
  *
  * Spark-first shape: record boundaries are found INSIDE the scan by
  * splitting on the `WARC/1.0\r\n` version marker via the lineSep
  * option (the same trick as [[FlatFile]]) — no sequential state
  * machine, no driver pass; each record then parses independently and
  * in parallel, so a 1000-file 100 TB crawl reads with one scan stage.
  *
  * Robustness contract (the sink-side skip-bad-rel discipline applied
  * at the source): every record's declared Content-Length is verified
  * against the actual payload octets, and the bytes past the payload
  * must be record-terminator CRLFs only. A corrupt record — truncated,
  * over-declared, or a payload that happens to embed the version marker
  * at line start (which the lineSep split would cut in two) — fails one
  * of those checks in every resulting chunk and is DROPPED: malformed
  * input degrades to counted row loss, never to wrong rows.
  *
  * Real Common Crawl WARCs are per-record gzip members; splitting those
  * in parallel needs a member-seeking InputFormat (the public
  * archive-spark / sparkling idiom) and a codec — out of scope in this
  * sandbox: this reader covers the uncompressed WARC shape.
  */
object Warc {

  /** One parsed WARC record. For `application/http` payloads the HTTP
    * envelope is stripped: `http_status`/`http_content_type` carry the
    * response line and entity type, `body` the entity bytes (as UTF-8
    * text). For other payloads (warcinfo etc.) `body` is the raw
    * payload and the http_* fields are empty. */
  final case class WarcRecord(
      warc_type: String,
      target_uri: String,
      warc_date: String,
      content_length: Long,
      http_status: String,
      http_content_type: String,
      body: String)

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Parse one marker-split chunk (everything between two `WARC/1.0`
    * markers): named headers, a blank line, `Content-Length` octets of
    * payload, then only terminator CRLFs. Returns None — drop — on any
    * violation. Pure function, unit-tested. */
  def parseRecord(chunk: String): Option[WarcRecord] = {
    val sep = chunk.indexOf("\r\n\r\n")
    if (sep < 0) return None
    val headers: Map[String, String] =
      chunk.substring(0, sep).split("\r\n").iterator.flatMap { line =>
        val i = line.indexOf(':')
        if (i <= 0) None
        else Some(line.substring(0, i).trim -> line.substring(i + 1).trim)
      }.toMap
    for {
      lenStr <- headers.get("Content-Length")
      len <- lenStr.toLongOption
      restBytes = chunk.substring(sep + 4).getBytes(Utf8)
      if len >= 0 && len <= restBytes.length
      payload = new String(restBytes, 0, len.toInt, Utf8)
      trailer = new String(restBytes, len.toInt, restBytes.length - len.toInt, Utf8)
      if trailer.forall(c => c == '\r' || c == '\n')
    } yield {
      val isHttp =
        headers.getOrElse("Content-Type", "").startsWith("application/http")
      val hsep = if (isHttp) payload.indexOf("\r\n\r\n") else -1
      val (status, ctype, body) =
        if (hsep >= 0) {
          val env = payload.substring(0, hsep).split("\r\n")
          val st = env.headOption.map(_.split(" "))
            .filter(_.length >= 2).map(_(1)).getOrElse("")
          val ct = env.iterator.drop(1).flatMap { l =>
            val i = l.indexOf(':')
            if (i > 0 && l.substring(0, i).equalsIgnoreCase("Content-Type"))
              Some(l.substring(i + 1).trim)
            else None
          }.nextOption().getOrElse("")
          (st, ct, payload.substring(hsep + 4))
        } else ("", "", payload)
      WarcRecord(
        headers.getOrElse("WARC-Type", ""),
        headers.getOrElse("WARC-Target-URI", ""),
        headers.getOrElse("WARC-Date", ""),
        len, status, ctype, body)
    }
  }

  /** Read WARC files into one row per well-formed record. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("lineSep", "WARC/1.0\r\n").text(path)
      .as[String]
      .filter(_.nonEmpty)
      .flatMap(parseRecord _)
      .toDF()
  }
}
