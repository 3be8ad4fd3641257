package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Warc

class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rec(headers: Seq[(String, String)], payload: String): String =
    headers.map { case (k, v) => s"$k: $v" }.mkString("", "\r\n", "\r\n\r\n") +
      payload + "\r\n\r\n"

  private def respHeaders(len: Long) = Seq(
    "WARC-Type" -> "response",
    "WARC-Target-URI" -> "https://ex.org/1",
    "WARC-Date" -> "2020-01-01T00:00:00Z",
    "Content-Type" -> "application/http; msgtype=response",
    "Content-Length" -> len.toString)

  private val http =
    "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n<html>hi</html>"

  test("parseRecord: well-formed response record, HTTP envelope stripped") {
    val r = Warc.parseRecord(rec(respHeaders(http.length), http)).get
    assert(r.warc_type == "response")
    assert(r.target_uri == "https://ex.org/1")
    assert(r.warc_date == "2020-01-01T00:00:00Z")
    assert(r.http_status == "200")
    assert(r.http_content_type == "text/html; charset=UTF-8")
    assert(r.body == "<html>hi</html>")
  }

  test("parseRecord: non-http payload kept raw (warcinfo)") {
    val r = Warc.parseRecord(rec(Seq(
      "WARC-Type" -> "warcinfo",
      "Content-Type" -> "application/warc-fields",
      "Content-Length" -> "12"), "software: ok")).get
    assert(r.warc_type == "warcinfo" && r.http_status == "" && r.body == "software: ok")
  }

  test("parseRecord: truncated Content-Length → trailer not CRLF → dropped") {
    assert(Warc.parseRecord(rec(respHeaders(http.length - 7), http)).isEmpty)
  }

  test("parseRecord: over-declared Content-Length → dropped") {
    assert(Warc.parseRecord(rec(respHeaders(http.length + 64), http)).isEmpty)
  }

  test("parseRecord: missing Content-Length or blank-line separator → dropped") {
    assert(Warc.parseRecord(rec(respHeaders(9).filterNot(_._1 == "Content-Length"), http)).isEmpty)
    assert(Warc.parseRecord("WARC-Type: response\r\nno blank line").isEmpty)
  }

  test("parseRecord: payload embedding the version marker splits into two dropped chunks") {
    val evil = "HTTP/1.1 200 OK\r\n\r\nbefore\r\nWARC/1.0\r\nafter"
    val full = rec(respHeaders(evil.length), evil)
    // what the lineSep split would hand the parser: two chunks
    val Array(a, b) = full.split("WARC/1.0\r\n", -1).filter(_.nonEmpty)
    assert(Warc.parseRecord(a).isEmpty) // payload cut short → trailer has text
    assert(Warc.parseRecord(b).isEmpty) // no header block shape
  }

  test("read: distributed marker-split round-trip, bad record dropped") {
    val dir = Files.createTempDirectory("warc_spec").toFile
    val good = rec(respHeaders(http.length), http)
    val bad = rec(respHeaders(http.length - 7), http)
    val info = rec(Seq(
      "WARC-Type" -> "warcinfo",
      "Content-Type" -> "application/warc-fields",
      "Content-Length" -> "12"), "software: ok")
    Files.writeString(
      new java.io.File(dir, "a.warc").toPath,
      Seq(good, bad, info).map("WARC/1.0\r\n" + _).mkString("", "\n", "\n"))
    val out = Warc.read(spark, dir.getAbsolutePath)
    assert(out.count() == 2)
    val resp = out.filter(col("warc_type") === "response").collect()
    assert(resp.length == 1 && resp(0).getAs[String]("body") == "<html>hi</html>")
    dir.listFiles().foreach(_.delete()); dir.delete()
  }
}
