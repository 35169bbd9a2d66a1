package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the anchor extractor beyond the planted-oracle query:
  * missing hrefs, nested markup, entities, unterminated tags, and the
  * non-anchor `<abbr>`-style false prefix.
  */
class HtmlLinksSpec extends AnyFunSuite {

  test("quote styles, attribute order, and entity decoding") {
    val html =
      """<a href="https://x.y/a">one</a>
        |<a href='/b'>two &amp; half</a>
        |<a class="z" href=/c>three</a>""".stripMargin
    assert(HtmlText.extractLinks(html) == Seq(
      "https://x.y/a" -> "one", "/b" -> "two & half", "/c" -> "three"))
  }

  test("anchors without href yield no row; nested markup strips") {
    val html = """<a name="top">skip me</a><a href="/d"><b>bo</b>ld</a>"""
    assert(HtmlText.extractLinks(html) == Seq("/d" -> "bold"))
  }

  test("abbr-like tags and unterminated anchors do not crash or leak") {
    val html = """<abbr>x</abbr><a href="/e">tail without close"""
    assert(HtmlText.extractLinks(html) == Seq("/e" -> "tail without close"))
    assert(HtmlText.extractLinks("<a href=") == Seq.empty)
    assert(HtmlText.extractLinks("") == Seq.empty)
  }

  test("script bodies between anchors never merge into anchor text") {
    val html =
      """<a href="/f">f</a><script>var a = "<a href='/fake'>no</a>";</script><a href="/g">g</a>"""
    val links = HtmlText.extractLinks(html)
    assert(links.map(_._1).contains("/f") && links.map(_._1).contains("/g"))
    // the quoted fake inside script text is raw chars to this scanner;
    // it may surface as a link but must never corrupt /f or /g
    assert(links.filter(l => l._1 == "/f" || l._1 == "/g") ==
      Seq("/f" -> "f", "/g" -> "g"))
  }
}
