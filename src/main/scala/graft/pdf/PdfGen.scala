package graft.pdf

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.zip.Deflater

/** Deterministic minimal-PDF writer — the generator side of the
  * driver-attested PDF roundtrip (x10): build a PDF from a known
  * string with ordinary Spark columns, push it through the REAL
  * `%PDF` dispatch + PdfSpans parse, and predict the extracted text
  * in SQL (VERDICT r2 "Next round" #1 — the last self-attested
  * pipeline branch).
  *
  * Emits exactly the operator subset PdfSpans documents (SURVEY.md
  * §7.7): one content stream per page (raw with `/Length`, or
  * FlateDecode via `java.util.zip.Deflater`), `BT/ET`, literal
  * strings with `\( \) \\` escaping, hex strings (Latin-1 byte
  * semantics, ASCII-safe), `Tj` shows and `Td` line breaks.
  */
object PdfGen {

  sealed trait Enc
  case object LiteralStr extends Enc
  /** Hex string `<48..>` — the parser maps byte pairs to chars
    * directly (Latin-1), so only chars ≤ 0xFF are representable. */
  case object HexStr extends Enc

  final case class Line(text: String, enc: Enc = LiteralStr)
  final case class Page(lines: Seq[Line], flate: Boolean)

  def makePdf(pages: Seq[Page]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write("%PDF-1.4\n".getBytes(US_ASCII))
    pages.zipWithIndex.foreach { case (p, i) =>
      val content = renderContent(p.lines)
      val body = if (p.flate) deflate(content) else content
      val dict =
        if (p.flate) s"<< /Length ${body.length} /Filter /FlateDecode >>"
        else s"<< /Length ${body.length} >>"
      out.write(s"${i + 1} 0 obj\n$dict\nstream\n".getBytes(US_ASCII))
      out.write(body)
      out.write("\nendstream\nendobj\n".getBytes(US_ASCII))
    }
    out.write("trailer\n%%EOF\n".getBytes(US_ASCII))
    out.toByteArray
  }

  private def renderContent(lines: Seq[Line]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("BT /F1 12 Tf 72 720 Td\n")
    lines.zipWithIndex.foreach { case (l, i) =>
      if (i > 0) sb.append("0 -14 Td\n") // Td = line break for the parser
      l.enc match {
        case LiteralStr =>
          sb.append('(').append(escape(l.text)).append(") Tj\n")
        case HexStr =>
          sb.append('<').append(hex(l.text)).append("> Tj\n")
      }
    }
    sb.append("ET")
    sb.toString.getBytes(UTF_8)
  }

  /** PDF literal-string escaping: backslash first, then parens. */
  private def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' || c == '(' || c == ')') sb.append('\\')
      sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def hex(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length * 2)
    s.foreach { c =>
      require(c <= 0xff, s"hex string char out of Latin-1 range: ${c.toInt}")
      sb.append(f"${c.toInt}%02X")
    }
    sb.toString
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    try {
      d.setInput(b)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(b.length + 32)
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }
}
