package graft

import graft.sources.Scraper

class ScraperSpec extends SparkSuite {

  private val page =
    """<html><head><title>ignored</title></head><body>
      |<nav><p>menu junk</p></nav>
      |<header class="x post-header y"><h1>Offshore <em>Leaks</em> Revealed</h1></header>
      |<div class="post-body">
      |  <p>First paragraph.</p>
      |  <figcaption>A caption</figcaption>
      |  <p>Second <a href="#">paragraph</a>.</p>
      |</div>
      |<footer><p>footer junk</p></footer>
      |</body></html>""".stripMargin

  test("extracts only post-header/post-body blocks, title gets a period") {
    val p = page // local copy: the fetch closure must not capture the suite
    val out = Scraper.articles(spark, Seq("http://example.test/a"),
      _ => p).collect()
    assert(out.length == 1)
    assert(out.head.getString(1) ==
      "Offshore Leaks Revealed.\nFirst paragraph.\nA caption\nSecond paragraph.")
  }

  test("pages with no wanted sections yield empty text, not errors") {
    val out = Scraper.articles(spark, Seq("u1", "u2"),
      _ => "<html><body><p>stray</p></body></html>").collect()
    assert(out.length == 2)
    assert(out.forall(_.getString(1) == ""))
  }
}
