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
/** Extraction engine selection — the reference's engine combo
  * ("Tesseract" / "EasyOCR" / "كلاهما", main_window.py:450). Engines
  * share one interface and differ in classifier strategy
  * (Boilerplate.Params); Both concatenates per part with the
  * reference's exact no-separator format (main_window.py:363-374).
  * PDF and plain-text payloads have no classifier stage, so they are
  * engine-invariant (a single parse — documented divergence from the
  * reference, where two real OCR engines would each re-read the page). */
sealed abstract class Engine(val name: String)
object Engine {
  case object Default extends Engine("default") // "Tesseract" analogue
  case object Alt extends Engine("alt")         // "EasyOCR" analogue
  case object Both extends Engine("both")       // "كلاهما"
  /** Strict: an unknown engine string is an error, not a silent
    * fallback to Default — the reference UI's engine combo can only
    * hold the three valid values (main_window.py:450), so a typo'd
    * engine arg must fail at analysis, never change semantics. */
  def parse(s: String): Engine = s match {
    case "default" => Default
    case "alt"     => Alt
    case "both"    => Both
    case other => throw new IllegalArgumentException(
      s"unknown graft engine '$other' (expected default|alt|both)")
  }
}

object Extractor {

  val ErrorPrefix = "حدث خطأ: " // exact reference format, ocr_parallel_ui.py:34

  def extract(payload: Array[Byte], lang: String): ExtractResult =
    extract(payload, lang, Engine.Default)

  def extract(payload: Array[Byte], lang: String, engine: Engine): ExtractResult = {
    if (payload == null || payload.isEmpty)
      return ExtractResult("", Nil, null) // blank input contract (FIXTURES.md §3)
    try {
      if (isPdf(payload)) extractPdf(payload)
      else decodeUtf8(payload) match {
        case None => ExtractResult(null, Nil, ErrorPrefix + "invalid utf-8 payload")
        case Some(s) =>
          if (looksHtml(s)) extractHtml(s, engine)
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

  /** Markup-dispatch predicate — single source of truth shared with
    * ExplodeBlocks so the block-level view and graft_extract classify
    * every payload identically (both '<' and '>' must appear, else the
    * payload routes to the plain-text path). */
  @inline def looksHtml(s: String): Boolean =
    s.indexOf('<') >= 0 && s.indexOf('>') >= 0

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

  def extractHtml(html: String): ExtractResult = extractHtml(html, Engine.Default)

  def extractHtml(html: String, engine: Engine): ExtractResult = {
    // fused single-pass segmentation (hot path); semantically identical
    // to BlockSegmenter.segment(HtmlTokenizer.tokenize(html)) — see
    // FusedEquivalenceSpec + frozen golden digest. Segmentation runs
    // ONCE for any engine choice; only classification differs (the
    // reference re-OCRs per engine because its engines are external
    // binaries — ours share the token stream).
    engine match {
      case Engine.Default =>
        // allocation-light raw path (shared doc buffer, range blocks)
        val rb = graft.html.FusedSegmenter.segmentRaw(html)
        val keep = Boilerplate.classifyRaw(rb, Boilerplate.Default)
        val (text, spans) = Assemble.fromRaw(rb, keep)
        ExtractResult(text, spans, null)
      case Engine.Alt =>
        val rb = graft.html.FusedSegmenter.segmentRaw(html)
        val keep = Boilerplate.classifyRaw(rb, Boilerplate.Alt)
        val (text, spans) = Assemble.fromRaw(rb, keep)
        ExtractResult(text, spans, null)
      case Engine.Both =>
        val blocks = graft.html.FusedSegmenter.segment(html)
        val keptA = Boilerplate.classify(blocks, Boilerplate.Default)
        val keptB = Boilerplate.classify(blocks, Boilerplate.Alt)
        val (text, spans) = Assemble.fromBlocksDual(keptA, keptB)
        ExtractResult(text, spans, null)
    }
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
