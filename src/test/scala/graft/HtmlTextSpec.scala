package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.nio.charset.StandardCharsets
import graft.extract.HtmlText

class HtmlTextSpec extends AnyFunSuite {

  /** Deterministic property loop (scalatestplus bridge not available). */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private def b(s: String) = s.getBytes(StandardCharsets.UTF_8)

  test("strips tags and head, keeps body text verbatim") {
    val html = "<html><head><title>T</title></head><body><p>Hello world.</p></body></html>"
    assert(HtmlText.extract(b(html)) == "Hello world.")
  }

  test("strips script/style blocks including their content") {
    val html = "<body><script>var x = '<p>no</p>';</script><p>yes</p><style>p{}</style></body>"
    assert(HtmlText.extract(b(html)) == "yes")
  }

  test("strips comments") {
    assert(HtmlText.extract(b("<p>a<!-- hidden <b>x</b> -->b</p>")) == "ab")
  }

  test("unescapes entities") {
    assert(HtmlText.extract(b("<p>a &amp; b &lt;c&gt; &quot;d&quot; &#65; &#x42; &nbsp;!</p>"))
      == "a & b <c> \"d\" A B  !".trim)
  }

  test("unknown entities kept verbatim; bare ampersand kept") {
    assert(HtmlText.extract(b("<p>R&D &bogus; x</p>")) == "R&D &bogus; x")
  }

  test("case-insensitive block tags") {
    assert(HtmlText.extract(b("<HEAD><TITLE>x</TITLE></HEAD><P>kept</P>")) == "kept")
  }

  test("escape/extract round-trip is identity on arbitrary body text") {
    val bodyGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '&', '#', '-', ',', '.', ':', '<', '>'))).map(_.mkString)
    forAllSeeded(bodyGen) { body =>
      val trimmed = body.trim
      val html = s"<html><head><title>t</title></head><body><p>${HtmlText.escape(trimmed)}</p></body></html>"
      assert(HtmlText.extract(b(html)) == trimmed)
    }
  }

  test("determinism: repeated extraction gives identical bytes") {
    val html = b("<html><body><p>Order 7 was placed by Customer#000000001.</p></body></html>")
    val out1 = HtmlText.extract(html)
    val out2 = HtmlText.extract(html)
    assert(out1 == out2)
    assert(out1.getBytes(StandardCharsets.UTF_8).sameElements(
      out2.getBytes(StandardCharsets.UTF_8)))
  }

  test("utf-8 multibyte content survives") {
    val text = "café 中文 😀"
    val html = b(s"<p>$text</p>")
    assert(HtmlText.extract(html) == text)
  }

  test("native HtmlExtract expression is byte-identical to the UDF form on fixture pages") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val bad = graft.fixtures.Corpus.pages(spark, TestSpark.sf0001)
      .select(
        HtmlText.htmlText(col("html")).as("nat"),
        HtmlText.extractUdf(col("html")).as("udf"))
      .filter(col("nat") =!= col("udf") ||
        xxhash64(col("nat")) =!= xxhash64(col("udf")))
      .count()
    assert(bad === 0L)
  }
}
