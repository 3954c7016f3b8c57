package graft.ops

import org.apache.spark.sql.DataFrame
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
}
