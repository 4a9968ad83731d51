package graft.html

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

  /** Max link-word share for a candidate block: linkWords/words ≤ 1/3. */
  @inline private def linkDense(b: Block): Boolean = b.linkWords * 3 > b.words

  /** Absolute word-count floor for body (non-heading) content. */
  val MinContentWords = 15

  /** Upper clamp for the auto threshold: the Otsu estimate may move the
    * cut within [MinContentWords, MaxAutoThreshold] but never above —
    * an auto threshold must not be able to reject a clearly substantial
    * block (≥25 words) however odd the document's histogram is. */
  val MaxAutoThreshold = 24

  /** Otsu accepted only when the low cluster looks like noise/teaser
    * text (mean ≤ MaxNoiseMean words), never when it would split real
    * content in a unimodal document. */
  val MaxNoiseMean = 12

  val HistBins = 64

  /** Keep decision over a whole document's blocks (all parts jointly).
    * Returns kept blocks in original order. Index-based single-pass
    * implementation (hot loop: no intermediate collections). */
  def classify(blocks: IndexedSeq[Block]): IndexedSeq[Block] = {
    val n = blocks.length
    // Stage 1 — hard rules (ROI analogue): structural boilerplate
    // containers and link-dense blocks are never content.
    // Stage 2 — Otsu threshold over candidate body-block word counts.
    val hist = new Array[Long](HistBins)
    var i = 0
    while (i < n) {
      val b = blocks(i)
      if (!b.boiler && b.words > 0 && !linkDense(b) && b.kind != "heading")
        hist(math.min(b.words, HistBins - 1)) += 1
      i += 1
    }
    val threshold = otsu(hist) match {
      case Some(t) => math.min(MaxAutoThreshold, math.max(MinContentWords, t))
      case None    => MinContentWords
    }

    @inline def candidate(b: Block): Boolean =
      !b.boiler && b.words > 0 && !linkDense(b)
    @inline def keptBody(b: Block): Boolean =
      candidate(b) && b.kind != "heading" && b.words >= threshold

    // Stage 3 — region rule for headings: a heading survives iff a kept
    // body block follows it within the same part before the next
    // heading (mirrors the reference's region-bounded psm-6 block
    // model, main_window.py:355-368).
    val keep = new Array[Boolean](n)
    var kept = 0
    i = 0
    while (i < n) {
      val b = blocks(i)
      if (keptBody(b)) { keep(i) = true; kept += 1 }
      else if (b.kind == "heading" && candidate(b)) {
        var j = i + 1
        var found = false
        var stop = false
        while (j < n && !stop && !found) {
          val nb = blocks(j)
          if (nb.part != b.part) stop = true
          else if (nb.kind == "heading") stop = true
          else if (keptBody(nb)) found = true
          j += 1
        }
        if (found) { keep(i) = true; kept += 1 }
      }
      i += 1
    }
    val out = new Array[Block](kept)
    var k = 0
    i = 0
    while (i < n) { if (keep(i)) { out(k) = blocks(i); k += 1 }; i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
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
  def otsu(hist: Array[Long]): Option[Int] = {
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
        // exact Long when safe (docs under ~1k blocks), BigInt beyond —
        // same result either way, still no floats.
        val better =
          if (bestT < 0) true
          else if (total <= 1000)
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
    if (lowCnt > 0 && lowSum <= MaxNoiseMean * lowCnt) Some(bestT) else None
  }
}
