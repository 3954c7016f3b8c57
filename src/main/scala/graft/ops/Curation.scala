package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline: the individually-verified
  * stages composed in the order a training-data run executes them —
  *
  *   1. canonicalize   NFC + whitespace collapse + trim  (CorpusSignals.canonText)
  *   2. redact PII     emails / IPv4 / phones            (CorpusSignals.redactPii)
  *   3. Gopher gate    length, token shape, function words, repetition
  *   4. exact dedup    first-id-wins on the canonical-text hash
  *   5. quality cut    top `keepFrac` per group by composite quality
  *   6. packing        fixed token budgets per group     (Sampling.packBudget)
  *
  * Composability is the point: every stage is the SAME arithmetic its
  * standalone operator ships (and its oracle verifies); `q_curate` verifies
  * the whole chain end to end in one DuckDB oracle, so stage boundaries
  * can't drift apart silently.
  *
  * Plan shape at 100 TB (pinned in CatalogPlanSpec): stages 1–3 are one
  * scan (zero exchanges — the gate halves the corpus before anything
  * shuffles); stage 4 is one exchange on the 60-bit text hash with the
  * rank-1 bound pushed map-side (WindowGroupLimit, Partial before the
  * exchange — a viral duplicate never funnels into one task); stages 5–6
  * share ONE exchange on the group key (rank, group-size count, and pack
  * cumsum are all windows over the same partitioning). TWO big-side
  * exchanges total for a six-stage pipeline, and the corpus is scanned
  * exactly once.
  */
object Curation {

  /** Run the pipeline; returns one row per SURVIVING document:
    * (id, grp, n_tokens, quality, pack).
    *
    * Gate thresholds default to [[CorpusSignals.gopherGate]]'s contract;
    * `minTokens`/`maxTokens` are the Gopher length band, `keepFrac` the
    * group-relative quality cut, `budget` the pack size in tokens.
    */
  def curate(df: DataFrame, idCol: String, textCol: String, groupCol: String,
             minTokens: Long = 50L, maxTokens: Long = 100000L,
             keepFrac: Double = 0.5, budget: Long = 2000L): DataFrame = {
    // stages 1–2: canonical text, PII redacted — pure scan-side chain
    val canon = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
      CorpusSignals.redactPii(CorpusSignals.canonText(col(textCol))).as("t"))
    // stage 3: the gate, gram kernel evaluated once via the Generate boundary
    val gated = canon
      .select(col("id"), col("grp"), col("t"),
        TextStats.tokenCount(col("t")).cast("long").as("n_tokens"),
        inline(array(CorpusSignals.gramStats(col("t"), 2))))
      .where(
        col("n_tokens").between(minTokens, maxTokens) &&
          TextStats.meanTokenLen(col("t")).between(3.0, 10.0) &&
          (TextStats.stopwordHits(col("t")) >= 2) &&
          (col("n_tokens") < 2 ||
            (col("n_grams") - col("n_distinct")).cast("double") / col("n_grams") <= 0.3))
      .select(col("id"), col("grp"), col("t"), col("n_tokens"))
    // stage 4: exact dedup, first id wins; rank-1 bound pushes map-side
    val wDedup = Window.partitionBy(col("__k")).orderBy(col("id"))
    val deduped = gated
      .withColumn("__k", TextDedup.portableHash(col("t")))
      .withColumn("__rk", row_number().over(wDedup))
      .where(col("__rk") === 1).drop("__k", "__rk")
    // stage 5: group-relative quality cut on the CURATED text
    val cut = Sampling.topFracByGroup(
      deduped.withColumn("quality", TextStats.qualityScore(col("t"))),
      "grp", "id", "quality", keepFrac)
    // stage 6: token-budget packing per group
    Sampling.packBudget(cut, "grp", "id", "n_tokens", budget)
      .select(col("id"), col("grp"), col("n_tokens"), col("quality"), col("pack"))
  }

  /** The round-4 gate chain composed end to end — a second curation
    * pipeline from this round's operators, same composability contract as
    * [[curate]] (every stage is the standalone-verified arithmetic):
    *
    *   1. sanitize       invisible-char hygiene        (CorpusSignals.stripInvisible)
    *   2. phrase gate    one-pass Aho–Corasick, drop on ANY hit
    *   3. exact dedup    first-id-wins on the clean-text hash
    *   4. per-source cap at most `cap` docs per source, hash-ordered
    *                     (the host-cap shape: deterministic, order-free)
    *   5. packing        fixed token budgets per source (Sampling.packBudget)
    *
    * Plan shape: stages 1–2 are scan-side (the automaton rides the scan,
    * zero exchange); stage 3 is one exchange on the 60-bit clean-text
    * hash with the rank-1 bound pushed map-side; stages 4–5 share ONE
    * exchange on the source key. Two big-side exchanges, one corpus scan.
    */
  def curate2(df: DataFrame, idCol: String, textCol: String, srcCol: String,
              phrases: Seq[String], cap: Long = 20L,
              budget: Long = 2000L): DataFrame = {
    require(phrases.nonEmpty, "curate2: need at least one blocked phrase")
    val clean = df.select(col(idCol).as("id"), col(srcCol).as("src"),
      CorpusSignals.stripInvisible(col(textCol)).as("t"))
    val gated = clean
      .withColumn("__hits",
        aggregate(CorpusSignals.multiMatchCounts(col("t"), phrases),
          lit(0L), (a, x) => a + x))
      .where(col("__hits") === 0L).drop("__hits")
    val wD = Window.partitionBy(col("__k")).orderBy(col("id"))
    val deduped = gated
      .withColumn("__k", TextDedup.portableHash(col("t")))
      .withColumn("__rk", row_number().over(wD))
      .where(col("__rk") === 1).drop("__k", "__rk")
    val wC = Window.partitionBy(col("src")).orderBy(col("__h"), col("id"))
    val capped = deduped
      .withColumn("__h", TextDedup.portableHash(
        concat(lit("cap "), col("id").cast("string"))))
      .withColumn("__rk", row_number().over(wC))
      .where(col("__rk") <= cap).drop("__h", "__rk")
      .withColumn("n_tokens", TextStats.tokenCount(col("t")).cast("long"))
    Sampling.packBudget(capped, "src", "id", "n_tokens", budget)
      .select(col("id"), col("src"), col("n_tokens"), col("pack"))
  }
}
