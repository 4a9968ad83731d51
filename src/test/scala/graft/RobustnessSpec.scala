package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.extract.Extractor
import graft.gen.PageGen
import graft.pdf.PdfSpans

/** Degradation & property tests (SURVEY.md §5.2 items 3-4): malformed
  * input NEVER throws out of the extractor — error-as-row always
  * (policy from ocr_parallel_ui.py:33-34). */
class RobustnessSpec extends AnyFunSuite {

  test("property: extract never throws on arbitrary byte payloads") {
    val genBytes = Gen.oneOf(
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      Gen.listOf(Gen.choose(32.toByte, 126.toByte)).map(_.toArray),
      // adversarial prefixes
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(t => "%PDF-1.4\n".getBytes("UTF-8") ++ t.toArray),
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(t => "<html><body>".getBytes("UTF-8") ++ t.toArray))
    (0 until 800).foreach { i =>
      val b = genBytes.pureApply(Gen.Parameters.default, Seed(1234L + i))
      val r = Extractor.extract(b, "en") // must not throw
      assert((r.text != null) != (r.error != null) || (r.text == "" && r.error == null),
        s"seed=$i: exactly one of text/error (or blank success): $r")
      r.spans.foreach(s => assert(s.start >= 0 && s.end <= (if (r.text == null) 0 else r.text.length)))
    }
  }

  test("pdf: truncation at every cut point parses or errors, never crashes") {
    val (bytes, full) = PageGen.pdfDoc(PageGen.rngFor(12345L), "en")
    assert(Extractor.extract(bytes, "en").text == full)
    var cuts = 0
    (1 until bytes.length by 7).foreach { cut =>
      val r = Extractor.extract(java.util.Arrays.copyOfRange(bytes, 0, cut), "en")
      assert(r.error == null || r.error.startsWith(Extractor.ErrorPrefix))
      cuts += 1
    }
    assert(cuts > 50)
  }

  test("pdf: escapes, TJ kerning arrays, hex strings, multi-page") {
    val content =
      """BT /F1 12 Tf 72 720 Td
        |(paren \(inside\) and \\ backslash) Tj
        |0 -14 Td
        |[(ker) -120 (ned)] TJ
        |0 -14 Td
        |<48656C6C6F> Tj
        |ET""".stripMargin.getBytes("UTF-8")
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + content.length +
      " >>\nstream\n").getBytes("UTF-8") ++ content ++
      "\nendstream\nendobj\ntrailer\n%%EOF\n".getBytes("UTF-8")
    val pages = PdfSpans.parsePages(pdf)
    assert(pages == Seq(Seq("paren (inside) and \\ backslash", "kerned", "Hello")))
  }

  test("extraction is a pure function: repeated calls bit-identical") {
    (0L until 50L).foreach { id =>
      val row = PageGen.row(id)
      val a = Extractor.extract(row.html, row.lang)
      val b = Extractor.extract(row.html.clone(), row.lang)
      assert(a == b, s"id=$id nondeterministic extraction")
    }
  }

  test("PdfGen roundtrip: adversarial strings through the real extractor") {
    import graft.pdf.PdfGen
    val cases = Seq(
      "plain words here",
      "parens (nested (deep)) and \\ backslash",
      "the word stream and endstream inside the text",
      "a /Length 99 impostor token",
      "unicode: 文字 عربية é ß",
      "multi\nline\ttext  with   runs",
      "")
    cases.foreach { body =>
      val pdf = PdfGen.makePdf(Seq(
        PdfGen.Page(Seq(PdfGen.Line("L1"), PdfGen.Line(body)), flate = false),
        PdfGen.Page(Seq(PdfGen.Line("P2"), PdfGen.Line("hex ok", PdfGen.HexStr)),
          flate = true)))
      val r = Extractor.extract(pdf, "en")
      assert(r.error == null, s"body='$body': ${r.error}")
      val normBody = graft.html.BlockSegmenter.normalize(body)
      val expected =
        "--- صفحة 1 ---\nL1\n" + normBody + "\n\n--- صفحة 2 ---\nP2\nhex ok"
      assert(r.text == expected, s"body='$body': got '${r.text}'")
      assert(r.spans.length == 2 && r.spans.forall(_.kind == "content"))
    }
    // streamless pdf → the reference-format error row (x10 plants this)
    val bad = Extractor.extract(
      "%PDF-1.4\nan empty pdf body here\n%%EOF\n".getBytes("UTF-8"), "en")
    assert(bad.error == "حدث خطأ: pdf: no content streams")
  }

  test("property: PdfGen roundtrip holds for arbitrary body strings") {
    import graft.pdf.PdfGen
    // printable ASCII (heavy on PDF syntax chars) and mixed unicode
    val genBody = Gen.oneOf(
      Gen.listOf(Gen.frequency(
        6 -> Gen.choose(32.toChar, 126.toChar),
        2 -> Gen.oneOf('(', ')', '\\', '<', '>', '[', ']', '%'),
        1 -> Gen.oneOf('\n', '\t', '\r', ' '))).map(_.mkString),
      Gen.listOf(Gen.oneOf("word", "صفحة", "stream", "Tj", "文", "é", " ", "\n"))
        .map(_.mkString))
    (0 until 200).foreach { i =>
      val body = genBody.pureApply(Gen.Parameters.default, Seed(777L + i))
      val pdf = PdfGen.makePdf(Seq(
        PdfGen.Page(Seq(PdfGen.Line("L1"), PdfGen.Line(body)), flate = i % 2 == 1),
        PdfGen.Page(Seq(PdfGen.Line("P2")), flate = i % 3 == 0)))
      val r = Extractor.extract(pdf, "en")
      assert(r.error == null, s"seed=$i body='${body.take(60)}': ${r.error}")
      val expected = "--- صفحة 1 ---\nL1\n" +
        graft.html.BlockSegmenter.normalize(body) + "\n\n--- صفحة 2 ---\nP2"
      assert(r.text == expected, s"seed=$i body='${body.take(60)}'")
    }
  }

  test("ExplodeBlocks mirrors extractPlain for plain-text payloads") {
    val spark = GraftSession.local(4, "graft-robust")
    GraftSession.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val plain = "first paragraph of words\n\nsecond  paragraph\n \nthird"
    val rows = Seq(plain).toDF("s")
      .select(expr("graft_explode_blocks(encode(s, 'UTF-8'))"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3), r.getBoolean(6)))
    val oracle = Extractor.extractPlain(plain)
    // same paragraph blocks, all kept, part 1 (extractPlain contract)
    val oracleBlocks = oracle.spans.map(s => oracle.text.substring(s.start, s.end))
    assert(rows.map(_._4).toSeq == oracleBlocks, s"blocks: ${rows.toSeq}")
    assert(rows.forall(r => r._1 == 1 && r._3 == "content" && r._5))
    assert(rows.map(_._2).toSeq == rows.indices.toSeq)
  }

  test("unicode trim handles NBSP like Python str.strip") {
    import graft.html.BlockSegmenter.unicodeTrim
    assert(unicodeTrim(" \u00A0x\u00A0 \t\n") == "x")
    assert(unicodeTrim(" a ") == "a")
    assert(unicodeTrim("") == "")
    assert(unicodeTrim(" ") == "")
  }
}
