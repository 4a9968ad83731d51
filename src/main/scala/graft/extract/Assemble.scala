package graft.extract

import graft.html.BlockSegmenter

/** Span offsets into the assembled extracted text.
  * kind ∈ content | heading | list. */
final case class Span(start: Int, end: Int, kind: String)

/** Page-ordered document assembly — THE byte-identity contract.
  *
  * Reproduces the reference's exact assembly format
  * (reference: main_window.py:382 `"--- صفحة {idx} ---\n{text}"` per
  * page; :385 `"\n\n".join(...).strip()`): every part gets the Arabic
  * page header with its 1-based ordinal, parts are joined with a blank
  * line, and the final string is Unicode-trimmed (Python str.strip
  * semantics — SURVEY.md §2.8 F8).
  *
  * Within a part, blocks are joined with a single "\n" (the reference's
  * psm-6 output is line-oriented within a page).
  *
  * Shared by the extractor AND the golden generator so the format has a
  * single source of truth; the *selection* of blocks is what the
  * pipeline must independently get right.
  */
object Assemble {

  final case class Part(idx: Int, blocks: Seq[(String, String)]) // (kind, text)

  def header(idx: Int): String = s"--- صفحة $idx ---"

  /** Assemble parts (already filtered to kept blocks, ordered) into the
    * final text plus spans addressing each block inside that text. */
  def assemble(parts: Seq[Part]): (String, Seq[Span]) = {
    val sb = new java.lang.StringBuilder(512)
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var first = true
    parts.foreach { p =>
      if (p.blocks.nonEmpty) {
        if (!first) sb.append("\n\n")
        first = false
        sb.append(header(p.idx)).append('\n')
        var firstBlock = true
        p.blocks.foreach { case (kind, text) =>
          if (!firstBlock) sb.append('\n')
          firstBlock = false
          val start = sb.length
          sb.append(text)
          spans += ((start, sb.length, kind))
        }
      }
    }
    val raw = sb.toString
    val trimmed = BlockSegmenter.unicodeTrim(raw)
    var shift = 0 // leading-trim offset (0 whenever a header is present)
    while (shift < raw.length && BlockSegmenter.isWs(raw.charAt(shift))) shift += 1
    val adjusted = spans.toSeq.collect {
      case (s, e, k) if e - shift > 0 && s - shift < trimmed.length =>
        Span(math.max(0, s - shift), math.min(trimmed.length, e - shift), k)
    }
    (trimmed, adjusted)
  }

  /** Group classified blocks by part and assemble. */
  def fromBlocks(blocks: Seq[BlockSegmenter.Block]): (String, Seq[Span]) = {
    val parts = blocks.groupBy(_.part).toSeq.sortBy(_._1).map { case (idx, bs) =>
      Part(idx, bs.map(b => (b.kind, b.text)))
    }
    assemble(parts)
  }
}
