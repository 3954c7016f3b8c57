package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.html.{Tokenizer, TEnd, TStart, TText}

/** Crawl-graph operators: outlink harvesting from raw HTML, host-level
  * edge aggregation, and a bit-reproducible fixed-point PageRank.
  *
  * The reference extracts per-document content only; a crawl pipeline at
  * corpus scale also needs the LINK STRUCTURE — for frontier scheduling,
  * spam/host authority scoring, and link-based quality priors (Page et al.
  * 1999). These operators reuse the library's own HTML tokenizer (the one
  * sanctioned opaque region) for harvesting and keep everything downstream
  * pure Catalyst.
  */
object WebGraph {

  /** Harvest `<a href=...>` outlinks per page with the real streaming HTML
    * tokenizer (case-folded tag/attr names, quote styles, entity-decoded
    * attribute values — regex href-scraping gets all of these wrong).
    * Emits one row per anchor in document order: (id, url, link_no, href).
    * Anchors without an href attribute are not links and are skipped.
    *
    * Plan: narrow scan-stage flatMap (the tokenizer region), no exchange.
    */
  def outlinks(df: DataFrame, idCol: String, urlCol: String,
               htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(urlCol).cast("string"),
        col(htmlCol).cast("string"))
      .as[(Long, String, String)]
      .flatMap { case (id, url, html) =>
        Tokenizer.tokenize(html).iterator
          .collect { case TStart("a", attrs, _) if attrs.contains("href") =>
            attrs("href")
          }
          .zipWithIndex
          .map { case (href, i) => (id, url, i.toLong, href) }
      }
      .toDF(idCol, urlCol, "link_no", "href")
  }

  /** Harvest (href, anchor text) pairs — the web-scale signal outlinks
    * alone can't give: anchor text is how the WEB describes the target
    * page, the classic relevance/quality prior (Brin & Page 1998 §2.2) and
    * a training-data label source. Anchor text is the concatenation of the
    * tokenizer's TText runs between `<a href>` and its close, entities
    * already decoded, whitespace collapsed; inline markup inside the
    * anchor (`<a>h<b>u</b>b</a>`) contributes its text. A new `<a>` start
    * tag implicitly closes an open anchor (the HTML parsing rule — nested
    * anchors are illegal and browsers recover exactly this way), as does
    * end-of-document. href-less `<a name=...>` anchors close an open link
    * but emit nothing.
    *
    * Same plan shape as [[outlinks]]: narrow scan-stage flatMap, no
    * exchange; (id, url, link_no, href, anchor) in document order.
    */
  def anchorTexts(df: DataFrame, idCol: String, urlCol: String,
                  htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(urlCol).cast("string"),
        col(htmlCol).cast("string"))
      .as[(Long, String, String)]
      .flatMap { case (id, url, html) =>
        val out = Vector.newBuilder[(String, String)]
        var href: String = null
        val sb = new StringBuilder
        def flush(): Unit = {
          if (href != null)
            out += ((href, sb.toString.trim.replaceAll("\\s+", " ")))
          href = null; sb.clear()
        }
        Tokenizer.tokenize(html).foreach {
          case TStart("a", attrs, selfClosing) =>
            flush()
            href = attrs.getOrElse("href", null)
            if (selfClosing) flush() // <a href=... /> is an empty-text link
          case TEnd("a")             => flush()
          case TText(t)              => if (href != null) sb.append(t)
          case _                     => ()
        }
        flush()
        out.result().iterator.zipWithIndex.map { case ((h, a), i) =>
          (id, url, i.toLong, h, a)
        }
      }
      .toDF(idCol, urlCol, "link_no", "href", "anchor")
  }

  /** Collapse page-level links to host-level weighted edges. Absolute
    * http(s) hrefs resolve to their own host; everything else (relative
    * paths, fragments, query-only) stays on the source host. One exchange
    * on (src, dst) — host-pair cardinality, not page cardinality.
    */
  def hostEdges(links: DataFrame, urlCol: String,
                hrefCol: String = "href"): DataFrame = {
    val src = lower(parse_url(col(urlCol), lit("HOST")))
    val dst = when(col(hrefCol).rlike("^[Hh][Tt][Tt][Pp][Ss]?://"),
      lower(parse_url(col(hrefCol), lit("HOST")))).otherwise(src)
    links
      .select(src.as("src"), dst.as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("weight"))
  }

  /** Fixed-point integer PageRank over an unweighted edge set, exact and
    * bit-reproducible across engines, partitionings and cluster sizes:
    * every quantity is a BIGINT and every division is floor division, so
    * there is no float accumulation order to disagree about.
    *
    *   r_0(v)     = scale div n
    *   r_{t+1}(v) = (15*scale) div (100*n)
    *              + (85 * sum_{u->v} (r_t(u) div out(u))) div 100
    *
    * (d = 0.85 as in Page et al. 1999; dangling-node mass is dropped, the
    * standard power-iteration simplification — the contract is the exact
    * integer recurrence above, which a DuckDB oracle replays verbatim.)
    *
    * Plan per iteration: contribution join on `src` (rank table × static
    * out-degree table — both host-cardinality, tiny next to the corpus;
    * AQE broadcasts them when they fit), one aggregation exchange on `dst`,
    * one left join back to the node set. Each round is materialized via
    * [[Checkpointer.truncate]] (localCheckpoint by default,
    * `spark.graft.checkpoint=reliable` for durable blocks): an iterative
    * self-referencing plan otherwise grows super-linearly in Catalyst
    * planning time (measured on dedupClusters: a 12-round lineage took
    * 13 minutes to PLAN; truncated, seconds).
    */
  /** HITS hubs & authorities (Kleinberg 1999, JACM 46(5)) in the same
    * bit-reproducible integer fixed-point style as [[pagerank]]: each
    * round computes raw authority = Σ hub over in-edges, normalizes by the
    * round MAX (floor division — the L1/L2 norms of the paper are
    * replaced by max-normalization, which preserves the ranking HITS is
    * used for while keeping every value an exact BIGINT), then the same
    * for hubs over the NEW authorities. Deterministic under any
    * partitioning; the norm is a 1-row broadcast aggregate, the per-round
    * exchanges are the two groupBys on dst/src.
    *
    * Overflow envelope (ANSI mode makes a violation loud, not silent):
    * rawValue · scale must stay < 2^63, i.e. max-in-degree · scale² <
    * 2^63 — at the default scale 10^6 that allows in-degrees to ~9·10^6;
    * pass a smaller scale for denser graphs.
    */
  def hits(edges0: DataFrame, srcCol: String = "src",
           dstCol: String = "dst", iters: Int = 3,
           scale: Long = 1000000L): DataFrame = {
    val edges = edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().transform(Checkpointer.truncate)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
      .transform(Checkpointer.truncate)
    // one normalized propagation step: scores flow across `edges` from
    // `from` to `to`, then floor-normalize by the round max
    def step(scores: DataFrame, scoreCol: String, from: String, to: String,
             outCol: String): DataFrame = {
      // truncate before the self-reference: `raw` feeds both the output
      // and its own max aggregate, and Spark has no cross-DataFrame CSE —
      // un-truncated, the whole join+aggregate subtree would execute twice
      val raw = Checkpointer.truncate(
        nodes.join(
            edges.join(scores.withColumnRenamed("id", from), from)
              .groupBy(col(to).as("id"))
              .agg(sum(col(scoreCol)).as("raw")),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("raw"), lit(0L)).as("raw")))
      raw.crossJoin(broadcast(raw.agg(max(col("raw")).as("mx"))))
        .select(col("id"),
          when(col("mx") > 0, expr(s"(raw * $scale) div mx"))
            .otherwise(lit(0L)).as(outCol))
    }
    // no outer truncate needed: step() already materializes its raw table,
    // so per-round lineage is one truncated frame + a broadcast + a project
    var auth = nodes.withColumn("auth", lit(scale))
    var hub = nodes.withColumn("hub", lit(scale))
    var i = 0
    while (i < iters) {
      auth = step(hub, "hub", "src", "dst", "auth")
      hub = step(auth, "auth", "dst", "src", "hub")
      i += 1
    }
    auth.join(hub, "id")
  }

  def pagerank(edges0: DataFrame, srcCol: String = "src",
               dstCol: String = "dst", iters: Int = 4,
               scale: Long = 1000000000L): DataFrame = {
    val edges = edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().transform(Checkpointer.truncate)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
      .transform(Checkpointer.truncate)
    val n = nodes.count()
    require(n > 0, "pagerank over an empty graph")
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .transform(Checkpointer.truncate)
    val teleport = (15L * scale) / (100L * n)
    var r = nodes.withColumn("pr", lit(scale / n))
    var i = 0
    while (i < iters) {
      val contrib = edges
        .join(r.withColumnRenamed("id", "src"), "src")
        .join(outdeg, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(expr("pr div deg")).as("c"))
      r = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr("(85 * coalesce(c, 0L)) div 100")).as("pr"))
        .transform(Checkpointer.truncate)
      i += 1
    }
    r
  }
}
