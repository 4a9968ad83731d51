package graft.extract

import java.nio.charset.{CharacterCodingException, StandardCharsets}
import java.nio.charset.CodingErrorAction
import java.nio.ByteBuffer

import graft.html.{BlockSegmenter, Boilerplate, HtmlTokenizer}
import graft.pdf.PdfSpans

/** Result of extracting one document. `error == null` on success;
  * on failure text/spans are null/empty and `error` carries the
  * reference's error-row message format (`ocr_parallel_ui.py:33-34`:
  * errors become rows `(path, "حدث خطأ: {exc}")`, never exceptions). */
final case class ExtractResult(text: String, spans: Seq[Span], error: String)

/** The recognize stage — preprocess → region-extract → recognize →
  * export for a single document payload, the Spark-side analogue of the
  * reference's per-page OCR loop (main_window.py:347-385).
  *
  * Payload dispatch mirrors the reference's extension routing
  * (main_window.py:331-340: .pdf → poppler, .tiff → multi-frame,
  * else single image) but keys on magic bytes since our payloads are
  * opaque binary: `%PDF` → PDF span parse; markup → HTML extraction;
  * plain UTF-8 text → paragraph blocks; undecodable bytes → error row.
  */
object Extractor {

  val ErrorPrefix = "حدث خطأ: " // exact reference format, ocr_parallel_ui.py:34

  def extract(payload: Array[Byte], lang: String): ExtractResult = {
    if (payload == null || payload.isEmpty)
      return ExtractResult("", Nil, null) // blank input contract (FIXTURES.md §3)
    try {
      if (isPdf(payload)) extractPdf(payload)
      else decodeUtf8(payload) match {
        case None => ExtractResult(null, Nil, ErrorPrefix + "invalid utf-8 payload")
        case Some(s) =>
          if (s.indexOf('<') >= 0 && s.indexOf('>') >= 0) extractHtml(s)
          else extractPlain(s)
      }
    } catch {
      case e: PdfSpans.PdfParseException =>
        ExtractResult(null, Nil, ErrorPrefix + "pdf: " + e.getMessage)
      case e: Exception =>
        // never fail the task (error-as-row policy); deterministic message
        ExtractResult(null, Nil, ErrorPrefix + e.getClass.getSimpleName)
    }
  }

  @inline private def isPdf(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F'

  /** Strict UTF-8 decode — malformed bytes are a detectable error, not
    * mojibake (byte-identity discipline, SURVEY.md §7.7).
    *
    * Fast path: `new String(bytes, UTF_8)` (intrinsified, one copy),
    * which substitutes U+FFFD on malformed input — so a U+FFFD in the
    * result (genuinely rare in valid documents) routes to the strict
    * CharsetDecoder to distinguish "malformed payload" from "document
    * that really contains U+FFFD". Identical classification to the
    * always-strict decoder at a fraction of the allocation. */
  def decodeUtf8(b: Array[Byte]): Option[String] = {
    val fast = new String(b, StandardCharsets.UTF_8)
    if (fast.indexOf('\uFFFD') < 0) return Some(fast)
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Some(dec.decode(ByteBuffer.wrap(b)).toString)
    catch { case _: CharacterCodingException => None }
  }

  def extractHtml(html: String): ExtractResult = {
    // fused single-pass segmentation (hot path); semantically identical
    // to BlockSegmenter.segment(HtmlTokenizer.tokenize(html)) — see
    // FusedEquivalenceSpec + frozen golden digest
    val blocks = graft.html.FusedSegmenter.segment(html)
    val kept = Boilerplate.classify(blocks)
    val (text, spans) = Assemble.fromBlocks(kept)
    ExtractResult(text, spans, null)
  }

  def extractPdf(bytes: Array[Byte]): ExtractResult = {
    val pages = PdfSpans.parsePages(bytes)
    val parts = pages.zipWithIndex.collect {
      case (lines, i) if lines.exists(_.nonEmpty) =>
        // each page is one content block: lines joined with "\n",
        // per-line whitespace normalized like HTML blocks
        val txt = lines.map(BlockSegmenter.normalize).mkString("\n")
        Assemble.Part(i + 1, Seq(("content", txt)))
    }
    val (text, spans) = Assemble.assemble(parts)
    ExtractResult(text, spans, null)
  }

  /** Plain text payload: paragraphs split on blank lines, every
    * paragraph kept (no boilerplate exists in plain text). */
  def extractPlain(s: String): ExtractResult = {
    val paras = s.split("\n[ \t\r]*\n", -1).toSeq
      .map(BlockSegmenter.normalize).filter(_.nonEmpty)
    if (paras.isEmpty) return ExtractResult("", Nil, null)
    val (text, spans) = Assemble.assemble(
      Seq(Assemble.Part(1, paras.map(p => ("content", p)))))
    ExtractResult(text, spans, null)
  }
}
