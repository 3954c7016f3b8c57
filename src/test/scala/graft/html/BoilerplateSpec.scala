package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Unit decisions of the boilerplate scorer (SURVEY.md §2.10): tag
  * blocklists, class/id negative signals, link-density threshold, raw-text
  * swallowing, table capture, malformed-markup tolerance. Corpus-level
  * behavior is frozen by goldens; these tests name each rule.
  */
class BoilerplateSpec extends AnyFunSuite {

  private def text(html: String): String = Boilerplate.extract(html).text

  test("tag blocklist: nav/header/footer/aside/script/style subtrees dropped") {
    val t = text(
      """<body><nav><p>home about contact</p></nav>
        |<header><p>site header words</p></header>
        |<article><p>the actual article body stays here</p></article>
        |<aside><p>aside chatter</p></aside>
        |<footer><p>copyright footer</p></footer>
        |<script>var kept = false;</script></body>""".stripMargin)
    assert(t == "the actual article body stays here")
  }

  test("class/id negative signals: sidebar/comment/ad classes dropped") {
    val t = text(
      """<body><div class="sidebar"><p>sidebar junk</p></div>
        |<div id="comments-area"><p>comment junk</p></div>
        |<div class="AdBanner"><p>buy things</p></div>
        |<div class="content"><p>real words of the page</p></div></body>""".stripMargin)
    assert(t == "real words of the page")
  }

  test("link-density: a link-farm block is dropped, prose with one link kept") {
    val farm = (1 to 8).map(i => s"""<a href="/$i">link$i</a>""").mkString(" ")
    val t = text(
      s"""<body><p>$farm</p>
         |<p>this is a long enough prose sentence with just <a href="/x">one link</a> inside it</p>
         |</body>""".stripMargin)
    assert(t.contains("prose sentence"))
    assert(!t.contains("link1"))
  }

  test("spans: one per kept block, offsets address the emitted text") {
    // a link-farm sibling is a *scored-out* block (counted in
    // blocksDropped); blocklist-tag subtrees are skipped pre-block
    val farm = (1 to 8).map(i => s"""<a href="/$i">l$i</a>""").mkString(" ")
    val ex = Boilerplate.extract(
      s"<body><p>first block</p><p>second block</p><p>$farm</p></body>")
    assert(ex.text == "first block\nsecond block")
    assert(ex.spans.length == 2)
    assert(ex.spans.map(s => ex.text.substring(s.start.toInt, s.end.toInt))
      == Vector("first block", "second block"))
    assert(ex.blocksKept == 2 && ex.blocksDropped >= 1)
  }

  test("tables inside content are captured as pdfplumber-shaped cells") {
    val ex = Boilerplate.extract(
      """<body><article><table>
        |<tr><th>Item</th><th>Qty</th></tr>
        |<tr><td>Pump</td><td>3</td></tr>
        |</table></article></body>""".stripMargin)
    assert(ex.tables.length == 1)
    assert(ex.tables.head == Vector(
      Vector(Some("Item"), Some("Qty")),
      Vector(Some("Pump"), Some("3"))))
  }

  test("malformed markup: unclosed tags and stray closers degrade, never throw") {
    val t = text("<body><p>open paragraph <div>stray <b>bold</p> text</div></span></body>")
    assert(t.contains("open paragraph"))
  }

  test("entities decoded in emitted text") {
    assert(text("<body><p>a &amp; b &#248; c</p></body>") == "a & b ø c")
  }
}
