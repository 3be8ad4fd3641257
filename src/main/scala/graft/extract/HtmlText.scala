package graft.extract

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Deterministic HTML → text extraction (north-rule stage 1).
  *
  * The reference's only "parse semi-structured text" operator is the KEGG
  * flat-file state machine (kegg_local.py:211-274, SURVEY.md S6); this is
  * its analogue for the web-page input shape. The per-url invariant
  * (BASELINE.json) is byte-identical output: same html bytes in → same
  * text bytes out, on any JVM/locale. Hence:
  *   - UTF-8 decode only (no platform charset),
  *   - no locale-dependent case ops (ASCII-only case folding for tag names),
  *   - a fixed, documented whitespace policy.
  *
  * Policy: strip <script>/<style>/<head> blocks and comments, drop all
  * remaining tags, unescape the HTML entities our corpus can contain,
  * then trim leading/trailing whitespace. No inner whitespace collapsing:
  * text inside a single block element round-trips byte-for-byte.
  */
object HtmlText {

  /** Pure extraction function; the whole pipeline hangs off its determinism. */
  def extract(html: Array[Byte]): String = {
    if (html == null) return null
    val s = new String(html, StandardCharsets.UTF_8)
    extractString(s)
  }

  def extractString(s: String): String = {
    val noBlocks = stripBlocks(s)
    val noTags = stripTags(noBlocks)
    unescape(noTags).trim
  }

  /** Remove <script>…</script>, <style>…</style>, <head>…</head> and
    * <!-- … --> entirely (their text content is not page text). */
  private def stripBlocks(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val blk = blockAt(s, i)
          if (blk != null) {
            val close = indexOfClose(s, i, blk)
            i = if (close < 0) n else close
          } else { sb.append(c); i += 1 }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val blocks = Array("script", "style", "head")

  /** If position i opens one of the stripped block tags, return its name. */
  private def blockAt(s: String, i: Int): String = {
    var b = 0
    while (b < blocks.length) {
      val name = blocks(b)
      if (regionMatchesAscii(s, i + 1, name)) {
        val after = i + 1 + name.length
        if (after < s.length && (s.charAt(after) == '>' || s.charAt(after) == ' ' || s.charAt(after) == '\t' || s.charAt(after) == '\n' || s.charAt(after) == '/'))
          return name
      }
      b += 1
    }
    null
  }

  /** Index just past "</name…>" closing tag, or -1. ASCII-case-insensitive. */
  private def indexOfClose(s: String, from: Int, name: String): Int = {
    var i = from
    val n = s.length
    while (i < n) {
      if (s.charAt(i) == '<' && i + 1 < n && s.charAt(i + 1) == '/' &&
          regionMatchesAscii(s, i + 2, name)) {
        val gt = s.indexOf('>', i + 2)
        return if (gt < 0) n else gt + 1
      }
      i += 1
    }
    -1
  }

  /** Locale-free ASCII case-insensitive region match. */
  private def regionMatchesAscii(s: String, at: Int, name: String): Boolean = {
    if (at + name.length > s.length) return false
    var k = 0
    while (k < name.length) {
      val a = s.charAt(at + k)
      val b = name.charAt(k)
      val al = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
      if (al != b) return false
      k += 1
    }
    true
  }

  /** Drop every remaining <…> tag; text between tags is kept verbatim. */
  private def stripTags(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    var inTag = false
    while (i < n) {
      val c = s.charAt(i)
      if (inTag) { if (c == '>') inTag = false }
      else if (c == '<') inTag = true
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Unescape the entity set the generator can emit (fixed, documented). */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep = ent match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try String.valueOf(Character.toChars(Integer.parseInt(e.substring(2), 16)))
              catch { case _: Exception => null }
            case e if e.startsWith("#") =>
              try String.valueOf(Character.toChars(Integer.parseInt(e.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Escape for the corpus *generator* (inverse direction, used by fixtures
    * and tests to prove the round-trip). */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Column form: registered Scala UDF — kept as the executable
    * specification of [[HtmlExtract]] (HtmlTextSpec asserts identity). */
  val extractUdf = udf((html: Array[Byte]) => extract(html))

  /** Native expression form of the extractor: the SAME [[extract]]
    * function, but invoked directly from generated code — no UDF
    * encoder round-trip per row, and the engine becomes fully UDF-free
    * (SURVEY §2.11's "one sanctioned UDF" is now an Expression too).
    * Byte-identity per url is still enforced end-to-end by the
    * pipeline's xxhash64 audit column. */
  case class HtmlExtract(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    import org.apache.spark.sql.types.{BinaryType, DataType, StringType}

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs binary, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "html_extract"
    override def nullSafeEval(a: Any): Any =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        extract(a.asInstanceOf[Array[Byte]]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.extract.HtmlText.extract($a));")
    override protected def withNewChildInternal(
        newChild: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression =
      copy(child = newChild)
  }

  def htmlText(html: Column): Column = {
    import org.apache.spark.sql.graftshim.shim
    shim.column(HtmlExtract(shim.expression(html)))
  }
}
