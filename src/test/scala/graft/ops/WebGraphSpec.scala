package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Web-graph contracts: tokenizer-backed outlink harvesting (case folding,
  * quote styles, entity decode, href-less anchors), host-level edge
  * resolution (absolute vs relative hrefs), and the exact integer PageRank
  * recurrence on a hand-computed graph plus its structural invariants.
  */
class WebGraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("outlinks: real-tokenizer harvest handles the HTML the regexes get wrong") {
    val s = spark
    import s.implicits._
    val html =
      """<HTML><Body>
        |<A HREF="https://a.example.com/x">upper tag+attr</A>
        |<a class='m' href='https://b.example.com/'>single quotes</a>
        |<a name="x">no href: not a link</a>
        |<a href=/bare/path>unquoted value</a>
        |<a href="/q?x=1&amp;y=2">entity in href</a>
        |<!-- <a href="https://commented.example.com/"> -->
        |</body></html>""".stripMargin
    val df = Seq((1L, "https://src.example.com/p", html)).toDF("id", "url", "html")
    val got = WebGraph.outlinks(df, "id", "url", "html")
      .orderBy("link_no").select("link_no", "href").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      0L -> "https://a.example.com/x",
      1L -> "https://b.example.com/",
      2L -> "/bare/path",
      3L -> "/q?x=1&y=2")) // decoded, comment ignored, href-less skipped
  }

  test("hostEdges: absolute hrefs resolve to their host, relative to the source host") {
    val s = spark
    import s.implicits._
    val links = Seq(
      ("https://src.example.com/p", "https://DST.example.com/x"),
      ("https://src.example.com/p", "/relative"),
      ("https://src.example.com/q", "HTTPS://dst.example.com/y"),
      ("https://other.example.com/r", "#frag"))
      .toDF("url", "href")
    val edges = WebGraph.hostEdges(links, "url")
      .orderBy("src", "dst").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(edges.toSeq == Seq(
      ("other.example.com", "other.example.com", 1L),
      ("src.example.com", "dst.example.com", 2L), // case-folded, both schemes
      ("src.example.com", "src.example.com", 1L)))
  }

  test("pagerank: exact integer recurrence on a hand-computed 3-node graph") {
    val s = spark
    import s.implicits._
    // a -> b, a -> c, b -> c, c -> a  (n=3, scale=1e9)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val scale = 1000000000L
    val n = 3L
    // replay the documented recurrence by hand
    def step(r: Map[String, Long]): Map[String, Long] = {
      val tele = (15L * scale) / (100L * n)
      val deg = Map("a" -> 2L, "b" -> 1L, "c" -> 1L)
      val contrib = Map(
        "a" -> (r("c") / deg("c")),
        "b" -> (r("a") / deg("a")),
        "c" -> (r("a") / deg("a") + r("b") / deg("b")))
      contrib.map { case (k, c) => k -> (tele + (85L * c) / 100L) }
    }
    var expect = Map("a" -> scale / n, "b" -> scale / n, "c" -> scale / n)
    (1 to 4).foreach(_ => expect = step(expect))
    val got = WebGraph.pagerank(edges, iters = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // c has two in-edges and must outrank b (one) which outranks nothing else
    assert(got("c") > got("b"))
  }

  test("pagerank: teleport floor for sinks, determinism across partitionings") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "b"), ("c", "b"), ("d", "b")).toDF("src", "dst")
    val pr = WebGraph.pagerank(edges, iters = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a, c, d have no in-edges: rank is exactly the teleport floor
    val tele = (15L * 1000000000L) / (100L * 4L)
    assert(pr("a") == tele && pr("c") == tele && pr("d") == tele)
    assert(pr("b") > tele)
    val pr2 = WebGraph.pagerank(edges.repartition(7), iters = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr2 == pr) // integer arithmetic: no partitioning sensitivity
  }

  test("hits: hand-computed max-normalized round; partitioning-invariant") {
    val s = spark
    import s.implicits._
    // a -> c, b -> c, c -> d : c is the authority, a/b are the hubs
    val edges = Seq(("a", "c"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val got = WebGraph.hits(edges, iters = 1, scale = 1000L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // auth raw from h0=1000: c=2000, d=1000, a=b=0; max 2000
    //   -> auth c=1000, d=500, a=b=0
    // hub raw from NEW auth: a=1000, b=1000, c=500, d=0; max 1000
    //   -> hub a=1000, b=1000, c=500, d=0
    assert(got == Map(
      "a" -> ((0L, 1000L)), "b" -> ((0L, 1000L)),
      "c" -> ((1000L, 500L)), "d" -> ((500L, 0L))))
    val got2 = WebGraph.hits(edges.repartition(5), iters = 1, scale = 1000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got2 == got) // integer arithmetic: no partitioning sensitivity
  }

  test("lineDedup: keep-first across the corpus, reassembly, counts") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "x\ny\nz"), // all first occurrences
      (2L, "y\nw"),    // y dropped (doc 1 had it), w kept
      (3L, "x\ny")     // everything dropped -> doc absent
    ).toDF("doc_id", "text")
    val out = TextDedup.lineDedup(df, "doc_id", "text",
        t => split(t, "\n"), sep = "\n")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, "x\ny\nz", 0L),
      (2L, 1L, "w", 1L)))
    // first-occurrence tie-break is (id, line_no): within one doc a repeated
    // line keeps only its earliest position
    val rep = Seq((5L, "a\na\nb")).toDF("doc_id", "text")
    val o2 = TextDedup.lineDedup(rep, "doc_id", "text",
        t => split(t, "\n"), sep = "\n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(o2.toSeq == Seq((5L, 2L, "a\nb", 1L)))
  }

  test("anchorTexts: inline markup, entities, implicit close, self-closing, whitespace") {
    val s = spark
    import s.implicits._
    val html =
      """<html><body>
        |<a href="/a">n<b>ex</b>t   page</a>
        |<a href='/b'>open anchor
        |<a href="/c">R&amp;D</a>
        |<a name="x">not a link</a>
        |<a href="/d"/>
        |<a href="/e">tail at eof""".stripMargin
    val got = WebGraph.anchorTexts(
        Seq((7L, "https://h.example/", html)).toDF("doc_id", "url", "html"),
        "doc_id", "url", "html")
      .orderBy("link_no").collect()
      .map(r => (r.getLong(2), r.getString(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (0L, "/a", "next page"),      // inline <b> contributes text; spaces collapse
      (1L, "/b", "open anchor"),    // implicitly closed by the next <a>
      (2L, "/c", "R&D"),            // entity decoded by the tokenizer
      (3L, "/d", ""),               // self-closing: empty-text link
      (4L, "/e", "tail at eof")))   // EOF closes the last anchor
  }

  test("hostBoilerplate: per-host df threshold, cross-host lines survive, all-boiler docs kept") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // host A: "nav" in all 3 docs (df=3 >= 2 -> boiler); "shared" in 2
      // A-docs (boiler at minDocs=2); body lines unique
      (1L, "A", "nav\nbody1\nshared"),
      (2L, "A", "nav\nbody2\nshared"),
      (3L, "A", "nav\nbody3"),
      // host B: "nav" appears in ONE B-doc only -> df=1 under B, KEPT even
      // though host A removes the same line; doc 5 is ALL boiler
      (4L, "B", "nav\nbfoot\nbody4"),
      (5L, "B", "bfoot"),
      (6L, "B", "bfoot\nbody6")
    ).toDF("doc_id", "host", "text")
    val out = TextDedup.hostBoilerplate(df, "doc_id", "host", "text",
        t => split(t, "\n"), sep = "\n", minDocs = 2L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2L, "body1"),
      (2L, 3L, 2L, "body2"),
      (3L, 2L, 1L, "body3"),
      (4L, 3L, 1L, "nav\nbody4"), // nav survives under host B
      (5L, 1L, 1L, ""),           // all-boiler doc comes back empty, not absent
      (6L, 2L, 1L, "body6")))
    // partitioning-invariant
    val o2 = TextDedup.hostBoilerplate(df.repartition(7), "doc_id", "host",
        "text", t => split(t, "\n"), sep = "\n", minDocs = 2L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(o2.toSeq == out.toSeq)
  }

  test("lineDedup plan: the keep decision rides WindowGroupLimit (map-side partial)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x\ny"), (2L, "y\nz")).toDF("doc_id", "text")
    val plan = TextDedup.lineDedup(df, "doc_id", "text",
      t => split(t, "\n"), sep = "\n").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"hot boilerplate lines must be capped map-side, plan:\n$plan")
  }
}
