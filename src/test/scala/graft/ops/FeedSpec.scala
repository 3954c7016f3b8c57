package graft.ops

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Feed parse contracts: RSS vs Atom dialect detection, the RFC 4287
  * rel=alternate default, channel/feed-level field isolation, link-less
  * entry drop, entity decoding, and entry numbering over emitted rows.
  */
class FeedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rows(xml: String): Seq[Row] = {
    val s = spark; import s.implicits._
    Feed.parse(Seq((1L, xml)).toDF("doc_id", "xml"))
      .orderBy("entry_no").collect().toSeq
  }

  test("rss: items parse, channel title/link ignored, link-less dropped") {
    val r = rows(
      """<rss version="2.0"><channel>
        |<title>Channel</title><link>http://chan/ignored</link>
        |<item><title> Hello &amp; Bye </title><link>http://a/1</link>
        |  <pubDate>Tue, 01 Jan 2025</pubDate><guid>g1</guid></item>
        |<item><title>dropped</title></item>
        |<item><link>http://a/2</link></item>
        |</channel></rss>""".stripMargin)
    assert(r.map(_.getString(2)) === Seq("rss", "rss"))
    assert(r.map(_.getLong(1)) === Seq(0L, 1L))
    assert(r(0).getString(3) === "Hello & Bye")
    assert(r(0).getString(4) === "http://a/1")
    assert(r(0).getString(5) === "Tue, 01 Jan 2025")
    assert(r(0).getString(6) === "g1")
    // second emitted row is the third item — numbering is over EMITTED rows
    assert(r(1).getString(4) === "http://a/2")
    assert(r(1).getString(3) === "")
  }

  test("atom: first alternate-or-bare link wins; self/enclosure skipped") {
    val r = rows(
      """<feed><title>F</title><link href="http://f/self" rel="self"/>
        |<entry><title>E1</title>
        |  <link rel="self" href="http://e/self"/>
        |  <link rel="enclosure" href="http://e/media.mp3"/>
        |  <link href="http://e/page"/>
        |  <link rel="alternate" href="http://e/late-alternate"/>
        |  <id>tag:1</id><updated>2025-01-01</updated></entry>
        |<entry><title>E2</title><link rel="alternate" href="http://e/2?a=1&amp;b=2"></link></entry>
        |<entry><title>none</title><id>tag:2</id></entry>
        |</feed>""".stripMargin)
    assert(r.length === 2)
    assert(r(0).getString(2) === "atom")
    assert(r(0).getString(4) === "http://e/page")
    assert(r(0).getString(6) === "tag:1")
    assert(r(0).getString(5) === "2025-01-01")
    // entity decode inside the href attribute
    assert(r(1).getString(4) === "http://e/2?a=1&b=2")
  }

  test("mixed garbage between entries does not leak fields") {
    val r = rows(
      """<rss><channel><item><title>t</title><link>http://x/1</link></item>
        |<title>between</title><link>http://between</link>
        |<item><link>http://x/2</link></item></channel></rss>""".stripMargin)
    assert(r.length === 2)
    assert(r(1).getString(3) === "")
    assert(r(1).getString(4) === "http://x/2")
  }

  test("empty / feedless payload yields no rows") {
    assert(rows("<html><body>not a feed</body></html>").isEmpty)
    assert(rows("").isEmpty)
  }
}
