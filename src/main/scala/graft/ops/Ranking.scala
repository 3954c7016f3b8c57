package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-style ranking over the corpus: BM25 scoring of documents
  * against a small term set (Robertson & Spärck Jones probabilistic
  * relevance framework; Robertson et al., TREC-3 Okapi).
  *
  * Cross-engine exactness: the contract uses the RATIONAL idf
  * (N - df + 0.5)/(df + 0.5) — the standard BM25 idf without the log.
  * log/exp are transcendentals with engine-dependent last-ulp rounding
  * (java.lang.Math.log permits 1 ulp error; libm differs), so a logged
  * score cannot be hash-verified across engines. The rational idf is a
  * strictly monotone transform of the logged one PER TERM (and the
  * default k1 = 1.5, b = 0.75 are exactly-representable binary fractions,
  * as are 0.5/0.25/2.5), so every float op in the score is an IEEE-exact
  * +,*,/ — bit-reproducible on any engine, any partitioning. Swap
  * `log(...)` into the idf factor (one Column edit) when deploying where
  * classic score values matter more than verifiability.
  *
  * Scale shape: the term set is tiny and baked into the scan as per-term
  * count columns (no explode of the corpus token stream, no (doc, term)
  * shuffle); corpus stats (N, Σdl, per-term df — all integral, so their
  * double sums are EXACT and aggregation-order-independent) are ONE
  * aggregate broadcast back as a single row; scoring is then scan-side
  * arithmetic. Two passes over the corpus total — a global statistic
  * genuinely requires a full pass before any row can be scored; at 100 TB
  * compute the stats row once per corpus snapshot and reuse it across
  * queries (it is a 1-row DataFrame — persist or write it out).
  */
object Ranking {

  /** BM25 scores for documents matching ≥1 term: (id, n_terms, score),
    * score = Σ_i idf_i · tf_i(k1+1) / (tf_i + k1(1-b + b·dl/avgdl)),
    * summed in FIXED term order (float + is not associative; a data-order
    * sum would not be reproducible).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25: need at least one term")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(TextStats.toks(col(textCol)), x => x === t))
        .cast("double").as(s"__tf$i")
    }
    val base = df.select(col(idCol).as("id") +:
      TextStats.tokenCount(col(textCol)).cast("double").as("__dl") +: tfCols: _*)
    val aggs = count(lit(1)).cast("double").as("__n") +:
      sum(col("__dl")).as("__sdl") +:
      terms.indices.map(i => sum((col(s"__tf$i") > 0).cast("double")).as(s"__df$i"))
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    // per-term weight; tf = 0 gives exactly 0.0, so no per-term CASE needed
    val w = terms.indices.map { i =>
      ((col("__n") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5)) *
        ((col(s"__tf$i") * lit(k1 + 1.0)) /
          (col(s"__tf$i") + lit(k1) *
            (lit(1.0 - b) + lit(b) * (col("__dl") / (col("__sdl") / col("__n"))))))
    }.reduce(_ + _) // fixed left-to-right term order
    val hits = terms.indices
      .map(i => (col(s"__tf$i") > 0).cast("long"))
      .reduce(_ + _)
    scored.select(col("id"), hits.as("n_terms"), w.as("score"))
      .where(col("n_terms") > 0)
  }

  /** The inverted index as a dataset artifact: one row per (term, doc) —
    * (term, id, tf, dl). Deliberately FLAT, not array-assembled posting
    * lists: at corpus scale a hot term ("the") is then just a hot shuffle
    * key spread over many rows, not a single array row that must fit in
    * one task's memory. The document length rides along from the scan
    * (min over identical values — no second corpus pass or join at query
    * time). Persist bucketed/partitioned by term for repeated retrieval;
    * one (term, id) shuffle to build.
    */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        TextStats.tokenCount(col(textCol)).cast("double").as("dl"),
        explode(TextStats.toks(col(textCol))).as("term"))
      .groupBy("term", "id")
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))

  /** Batch retrieval over the inverted index: BM25 top-k per query,
    * disjunctive (≥1 term matches; `n_terms` counts how many). Same
    * transcendental-free weight as [[bm25]]; per-document scores are
    * summed by an explicit left fold in ASCENDING TERM ORDER (float + is
    * not associative — a data-order sum would not be bit-reproducible),
    * so for an alphabetically-ordered term list the score is bit-identical
    * to [[bm25]]'s fixed-order sum (absent terms contribute an exact +0.0
    * there).
    *
    * Scale shape: the query batch broadcasts into the index scan (an
    * equi-join on term prunes to matching postings only), per-term df is
    * one aggregate over those matching postings, corpus N/Σdl is ONE
    * 1-row broadcast aggregate, and the (query, doc) sum is a hash
    * aggregate over hit rows — nothing corpus-sized shuffles except the
    * index build itself, which is the persisted artifact.
    */
  def searchTopK(df: DataFrame, idCol: String, textCol: String,
                 queries: Seq[(Long, Seq[String])], k: Int = 10,
                 k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "searchTopK: need at least one query")
    val spark = df.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (qid, ts) => ts.distinct.map(qid -> _) }
      .toDF("qid", "term")
    val idx = postings(df, idCol, textCol)
    val dfs = idx.join(broadcast(qt.select("term").distinct()), Seq("term"))
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val stats = df.agg(count(lit(1)).cast("double").as("n"),
      sum(TextStats.tokenCount(col(textCol)).cast("double")).as("sdl"))
    val w = ((col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
      ((col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") + lit(k1) *
          (lit(1.0 - b) + lit(b) * (col("dl") / (col("sdl") / col("n"))))))
    val hits = idx.join(broadcast(qt), Seq("term"))
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("id"), col("term"), w.as("w"))
    val scored = hits.groupBy("qid", "id")
      .agg(count(lit(1)).as("n_terms"),
        array_sort(collect_list(struct(col("term"), col("w").as("w")))).as("cw"))
      .select(col("qid"), col("id"), col("n_terms"),
        aggregate(transform(col("cw"), x => x.getField("w")),
          lit(0.0), (acc, x) => acc + x).as("score"))
    val rw = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(rw)).where(col("rank") <= k)
  }
}
