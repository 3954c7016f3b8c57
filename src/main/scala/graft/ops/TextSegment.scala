package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sub-document text segmentation and vocabulary-relative statistics — the
  * ops a curation pipeline runs BETWEEN extraction and tokenization:
  * sentence segmentation (decontam and dedup at sentence granularity,
  * sentence-boundary-respecting sequence packing), out-of-vocabulary rate
  * against the corpus vocabulary head (tokenizer-fit / language-drift
  * telemetry per document), and per-document TF-IDF term heads (keyword
  * induction, topic balance audits).
  *
  * Everything is either a pure scan-side Column program (sentences) or a
  * map-side-combinable aggregate meeting a small broadcast table (OOV) —
  * the TF-IDF head is the one genuinely shuffled op and says so.
  */
object TextSegment {

  /** U+001E RECORD SEPARATOR, written as a code-point escape so the source
    * file itself carries no control bytes.
    */
  private val RS: String = "\u001e"

  /** Sentence segmentation as a scan-side Column program: mark terminator
    * boundaries (`[.!?]` followed by whitespace) with an RS control char
    * (U+001E, never in natural text), split on it, trim, drop empties.
    * Rule-based splitting is the industry default at corpus scale
    * (C4/Gopher/CCNet all segment with regex-class rules, not models);
    * the marker-then-split construction exists because lookbehind is not
    * portable across regex engines (RE2 has none) while capture-replace
    * is — the identical boundary rule runs on any engine.
    *
    * Plan: regexp_replace + split + transform + filter, all inside
    * WholeStageCodegen on the scan — zero exchange, no UDF.
    */
  def sentenceArray(text: Column): Column = {
    val marked = regexp_replace(text, "([.!?])\\s+", "$1" + RS)
    filter(transform(split(marked, RS), s => trim(s)),
      s => length(s) > 0)
  }

  /** Exploded sentence table: (id, sent_no, sentence, n_words) — one row
    * per sentence, `sent_no` 0-based in document order. The array
    * materializes ONCE in its own projection before posexplode (HOF
    * lambdas get no common-subexpression elimination — the lineDedup
    * lesson applied at design time).
    */
  def sentences(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), sentenceArray(col(textCol)).as("sa"))
      .select(col(idCol), posexplode(col("sa")).as(Seq("sent_no", "sentence")))
      .withColumn("n_words", size(split(col("sentence"), " ")))

  /** Per-document out-of-vocabulary rate against the corpus top-`topK`
    * vocabulary (by document frequency, ties by token — the
    * [[CorpusSignals.vocab]] head): (id, n_tokens, n_oov, oov_permille)
    * with `oov_permille = (1000·n_oov) div n_tokens` — integral, so the
    * row is bit-stable cross-engine.
    *
    * Scale shape: the vocabulary head is topK rows → BROADCAST; the token
    * explode meets it map-side (left join, no corpus shuffle), and the
    * per-document counts are one hash aggregate on the document id with
    * map-side partials. Two corpus scans total (one to build the head,
    * one to score) — at 10^12 documents the head build is itself one
    * map-combinable aggregate + TakeOrderedAndProject, never a full sort.
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
              topK: Int = 100): DataFrame = {
    val head = CorpusSignals.vocab(df, idCol, textCol, topK)
      .select(col("token"), lit(1).as("__in_v"))
    df.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .join(broadcast(head), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_permille",
        expr("(1000 * n_oov) div n_tokens"))
  }

  /** Flesch readability in scaled-integer milli-units — the classic
    * surface-statistics quality signal (Flesch 1948; Kincaid 1975), used by
    * readability-gated curation recipes next to the Gopher rules. Words and
    * syllables come from `wordsCol` (syllables ≈ vowel-group runs
    * `[aeiouy]+` per word, floored at 1 — the standard heuristic);
    * sentences from `sentencedCol` via [[sentenceArray]] (the two columns
    * are separate because boundary punctuation may live in a different
    * rendering of the text than the token stream).
    *
    * All arithmetic is scaled-integer with `div`:
    *   flesch_milli   = 206835 − (1015·W) div S − (84600·Y) div W
    *   fk_grade_milli = (390·W) div S + (11800·Y) div W − 15590
    * — bit-stable cross-engine, monotone in the same ratios as the real
    * formulas (the div-rounding is below the granularity anyone gates on).
    * Documents with zero words or zero sentences are dropped (the formula
    * is undefined; a gate treats them as rejected upstream anyway).
    *
    * Plan: one scan, everything a Column program (the syllable sum is a
    * fold over the token array), one guard filter — zero exchange.
    */
  def readability(df: DataFrame, idCol: String,
                  wordsCol: String, sentencedCol: String): DataFrame = {
    val ts = split(col(wordsCol), " ")
    val syll = aggregate(
      transform(ts, w => greatest(lit(1), regexp_count(w, lit("[aeiouy]+")))),
      lit(0L), (acc, x) => acc + x)
    df.select(col(idCol),
        size(ts).cast("long").as("n_words"),
        size(sentenceArray(col(sentencedCol))).cast("long").as("n_sents"),
        syll.as("n_syll"))
      .where(col("n_words") >= 1 && col("n_sents") >= 1)
      .withColumn("flesch_milli",
        lit(206835L) - expr("(1015 * n_words) div n_sents")
          - expr("(84600 * n_syll) div n_words"))
      .withColumn("fk_grade_milli",
        expr("(390 * n_words) div n_sents")
          + expr("(11800 * n_syll) div n_words") - lit(15590L))
  }

  /** Per-document TF-IDF term head: top-`k` tokens per document by
    * `score = tf · ((N·1000000) div df)` — the classic weighting with the
    * logarithm replaced by a scaled-integer rational idf (transcendental
    * functions round differently across engines; a monotone rational
    * surrogate preserves the RANKING, which is what a term head is for,
    * and keeps every value a BIGINT). Ties break by token; `N·1000000`
    * stays under 2^63 up to ~9·10^12 documents.
    *
    * Scale shape, stated honestly: tf = one hash aggregate on
    * (id, token); df = one hash aggregate on token OVER tf (already one
    * row per (doc, token), so `count(*)` IS the document frequency —
    * no countDistinct re-scan); tf⋈df is a shuffled equi-join on token
    * (the df side is corpus-vocabulary-sized — Zipf-big, NOT broadcast);
    * the head is a rank window on id → WindowGroupLimit pushes the
    * per-partition top-k ahead of the final exchange. Three exchanges
    * total, all on keys with map-side partial aggregation.
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tf = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = df.select(col(idCol)).agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * expr("(__n * 1000000L) div df"))
      .drop("__n")
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"),
        col("token"), col("tf"), col("df"), col("score"))
  }
}
