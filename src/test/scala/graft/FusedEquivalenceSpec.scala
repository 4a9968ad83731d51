package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.gen.PageGen
import graft.html.{BlockSegmenter, FusedSegmenter, HtmlTokenizer}

/** The fused hot-path segmenter must be block-for-block identical to
  * the readable reference pair (tokenize → segment). */
class FusedEquivalenceSpec extends AnyFunSuite {

  private def unfused(s: String) = BlockSegmenter.segment(HtmlTokenizer.tokenize(s))

  test("equivalent on 3000 generated HTML documents") {
    (0L until 3000L).foreach { id =>
      if (PageGen.kindOf(id) == PageGen.Html || PageGen.kindOf(id) == PageGen.Blank) {
        val html = new String(PageGen.row(id).html, "UTF-8")
        assert(FusedSegmenter.segment(html) == unfused(html), s"id=$id diverged")
      }
    }
  }

  test("equivalent on adversarial tag soup") {
    val nasty = Seq(
      "", "<", "plain text only", "<p>a<b>c", "a &amp b &unknown; &#x41;",
      "<div>a</div>b<div>c", "<script>while(1){if(a<b)x()}</script><p>x</p>",
      "<SCRIPT>s</SCRIPT><P>Q</P>", "<a href=\"x>y\">l</a>m",
      "<article><article><p>deep</p></article></article>",
      "<nav>x<div>y</div>z</nav>w", "<!-- <p>no</p> --><p>yes</p>",
      "<h1>h<h2>g</h2></h1><p>body body body</p>", "</>", "< p>not a tag</ p>",
      "<ul><li>a</li>between<li>b</li></ul>", "<title>t</title>x",
      "<p>&#1605;&#1585;&#1581;&#1576;&#1575;</p>", "a<br/>b<br />c",
      "text &hellip", "&;x", "<div class='q\">'>z</div>")
    nasty.foreach { s =>
      assert(FusedSegmenter.segment(s) == unfused(s), s"input: $s")
    }
  }

  test("property: equivalent on random markup-ish strings") {
    val frag = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("<p>", "</p>", "<div>", "</div>", "<a>", "</a>", "<nav>",
        "</nav>", "<li>", "</li>", "<h1>", "</h1>", "<article>", "</article>",
        "&amp;", "&#65;", "&bad;", " ", "\n", "\t", "<", ">", "<!--", "-->",
        "<script>", "</script>", "é", "ص", "&"))
    val doc = Gen.listOf(frag).map(_.mkString)
    // deterministic scalacheck sampling (offline cache has no
    // scalatestplus bridge; fixed seed keeps the corpus stable)
    (0 until 500).foreach { i =>
      val s = doc.pureApply(Gen.Parameters.default, Seed(42L + i))
      assert(FusedSegmenter.segment(s) == unfused(s), s"seed=$i input: $s")
    }
  }
}
