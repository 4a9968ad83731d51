package graft.html

import scala.collection.mutable.ArrayBuffer

import BlockSegmenter.Block

/** Block-level boilerplate classifier — text-density / link-density
  * heuristics with an Otsu-style auto threshold.
  *
  * The reference binarizes each page with Otsu's method before OCR
  * (reference: image_preprocess.py:24 — cv2.THRESH_BINARY+THRESH_OTSU);
  * our domain analogue classifies text blocks as content vs boilerplate
  * at an auto-chosen word-count threshold over the document's own block
  * histogram (SURVEY.md §2.4 A6, §2.8 F4).
  *
  * Determinism (SURVEY.md §7.7): the histogram has a fixed 64-bin
  * layout and the argmax uses exact integer arithmetic with a
  * lowest-threshold tie-break — no floating point anywhere.
  */
object Boilerplate {

  /** Classifier strategy parameters — the pluggable-recognizer seam
    * (reference: engine combo "Tesseract"/"EasyOCR"/"كلاهما",
    * main_window.py:450; both engines share one interface and differ
    * only in their decision behavior, main_window.py:365-374).
    *
    * @param minContentWords absolute word-count floor for body content
    * @param maxAutoThreshold upper clamp for the Otsu auto threshold —
    *   the estimate may move the cut within [minContentWords, this]
    *   but never above: an auto threshold must not reject a clearly
    *   substantial block however odd the document's histogram is
    * @param maxNoiseMean Otsu accepted only when the low cluster looks
    *   like noise/teaser text (mean ≤ this many words)
    * @param linkShareNum/Den max link-word share num/den (exceeding ⇒
    *   the block is link-dense and never content) */
  final case class Params(
      minContentWords: Int,
      maxAutoThreshold: Int,
      maxNoiseMean: Int,
      linkShareNum: Int,
      linkShareDen: Int)

  /** Primary engine (the "Tesseract" analogue) — precision-biased. */
  val Default: Params = Params(15, 24, 12, 1, 3)

  /** Alternate engine (the "EasyOCR" analogue) — recall-biased: lower
    * content floor, tighter Otsu clamp, laxer link-density gate. */
  val Alt: Params = Params(8, 16, 8, 1, 2)

  @inline private def linkDense(b: Block, p: Params): Boolean =
    b.linkWords * p.linkShareDen > b.words * p.linkShareNum

  /** Absolute word-count floor for body (non-heading) content. */
  val MinContentWords = Default.minContentWords

  /** See Params.maxAutoThreshold. */
  val MaxAutoThreshold = Default.maxAutoThreshold

  /** See Params.maxNoiseMean. */
  val MaxNoiseMean = Default.maxNoiseMean

  val HistBins = 64

  /** Default-engine classification (frozen golden-digest behavior). */
  def classify(blocks: IndexedSeq[Block]): IndexedSeq[Block] =
    classify(blocks, Default)

  /** Keep decision over a whole document's blocks (all parts jointly).
    * Returns kept blocks in original order. Thin adapter over
    * `classifyCore` (ONE decision implementation for both the Block
    * view and the allocation-light raw hot path). */
  def classify(blocks: IndexedSeq[Block], p: Params): IndexedSeq[Block] = {
    val n = blocks.length
    val parts = new Array[Int](n)
    val kindIds = new Array[Int](n)
    val words = new Array[Int](n)
    val linkWords = new Array[Int](n)
    val boiler = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val b = blocks(i)
      parts(i) = b.part
      kindIds(i) = if (b.kind == "heading") 1 else if (b.kind == "list") 2 else 0
      words(i) = b.words; linkWords(i) = b.linkWords; boiler(i) = b.boiler
      i += 1
    }
    val keep = classifyCore(n, parts, kindIds, words, linkWords, boiler, p)
    val out = ArrayBuffer.empty[Block]
    i = 0
    while (i < n) { if (keep(i)) out += blocks(i); i += 1 }
    out.toIndexedSeq
  }

  /** Keep decision on the raw range-based representation (hot path). */
  def classifyRaw(rb: FusedSegmenter.RawBlocks, p: Params): Array[Boolean] =
    classifyCore(rb.n, rb.parts, rb.kindIds, rb.words, rb.linkWords, rb.boiler, p)

  /** The classifier proper. kindId: 0=content 1=heading 2=list.
    * Index-based single pass (hot loop: no intermediate collections). */
  def classifyCore(n: Int, parts: Array[Int], kindIds: Array[Int],
                   words: Array[Int], linkWords: Array[Int],
                   boiler: Array[Boolean], p: Params): Array[Boolean] = {
    @inline def dense(i: Int): Boolean =
      linkWords(i) * p.linkShareDen > words(i) * p.linkShareNum
    // Stage 1 — hard rules (ROI analogue): structural boilerplate
    // containers and link-dense blocks are never content.
    // Stage 2 — Otsu threshold over candidate body-block word counts.
    val hist = new Array[Long](HistBins)
    var i = 0
    while (i < n) {
      if (!boiler(i) && words(i) > 0 && !dense(i) && kindIds(i) != 1)
        hist(math.min(words(i), HistBins - 1)) += 1
      i += 1
    }
    val threshold = otsu(hist, p.maxNoiseMean) match {
      case Some(t) => math.min(p.maxAutoThreshold, math.max(p.minContentWords, t))
      case None    => p.minContentWords
    }

    @inline def candidate(i: Int): Boolean =
      !boiler(i) && words(i) > 0 && !dense(i)
    @inline def keptBody(i: Int): Boolean =
      candidate(i) && kindIds(i) != 1 && words(i) >= threshold

    // Stage 3 — region rule for headings: a heading survives iff a kept
    // body block follows it within the same part before the next
    // heading (mirrors the reference's region-bounded psm-6 block
    // model, main_window.py:355-368).
    val keep = new Array[Boolean](n)
    i = 0
    while (i < n) {
      if (keptBody(i)) keep(i) = true
      else if (kindIds(i) == 1 && candidate(i)) {
        var j = i + 1
        var found = false
        var stop = false
        while (j < n && !stop && !found) {
          if (parts(j) != parts(i)) stop = true
          else if (kindIds(j) == 1) stop = true
          else if (keptBody(j)) found = true
          j += 1
        }
        if (found) keep(i) = true
      }
      i += 1
    }
    keep
  }

  /** Otsu's threshold over an integer histogram, exact integer math.
    *
    * Maximizes between-class variance w0*w1*(mu0-mu1)^2, compared as
    * fractions num(t)^2 * denom(t') vs num(t')^2 * denom(t) where
    * num(t) = sum0*cnt1 - sum1*cnt0 and denom(t) = cnt0*cnt1 — no
    * floats, so bit-identical on every JVM/arch. Tie-break: lowest t.
    * Returns the chosen threshold (first bin of the upper class) only
    * when the split is meaningful: both classes non-empty and the low
    * class mean ≤ MaxNoiseMean.
    */
  def otsu(hist: Array[Long]): Option[Int] = otsu(hist, Default.maxNoiseMean)

  def otsu(hist: Array[Long], maxNoiseMean: Int): Option[Int] = {
    val n = hist.length
    var total = 0L
    var totalSum = 0L
    var i = 0
    while (i < n) { total += hist(i); totalSum += hist(i) * i; i += 1 }
    if (total == 0) return None

    var bestT = -1
    var bestNum = 0L   // num(t) — guaranteed >= 0 is NOT true; track squared compare
    var bestDen = 1L
    var cnt0 = 0L
    var sum0 = 0L
    var t = 1
    while (t < n) {
      cnt0 += hist(t - 1)
      sum0 += hist(t - 1) * (t - 1)
      val cnt1 = total - cnt0
      if (cnt0 > 0 && cnt1 > 0) {
        val sum1 = totalSum - sum0
        val num = sum0 * cnt1 - sum1 * cnt0 // |num| ≤ ~4e6 at doc scale
        val den = cnt0 * cnt1
        // compare num^2/den > bestNum^2/bestDen via cross-multiply;
        // exact Long when safe, BigInt beyond — same result either way,
        // still no floats. Worst case |num|² · den ≈ 992·total⁶, which
        // stays under Long.MaxValue only for total ≤ ~458 — hence the
        // 450 gate (a higher gate could silently overflow and pick a
        // different threshold than the BigInt path).
        val better =
          if (bestT < 0) true
          else if (total <= 450)
            num * num * bestDen > bestNum * bestNum * den
          else
            BigInt(num) * num * bestDen > BigInt(bestNum) * bestNum * den
        if (better) { bestT = t; bestNum = num; bestDen = den }
      }
      t += 1
    }
    if (bestT < 0) return None
    // quality gate: low-class mean must look like noise, not content
    var lowCnt = 0L; var lowSum = 0L
    i = 0
    while (i < bestT) { lowCnt += hist(i); lowSum += hist(i) * i; i += 1 }
    if (lowCnt > 0 && lowSum <= maxNoiseMean.toLong * lowCnt) Some(bestT) else None
  }
}
