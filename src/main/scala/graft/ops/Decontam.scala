package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share word
  * n-grams with an evaluation/benchmark set — the n-gram-overlap
  * contamination check of Brown et al. 2020 (GPT-3, appendix C) and the
  * Llama line of work, conventionally run at n = 13.
  *
  * Shape at scale: the benchmark side is SMALL (eval suites are 10^4–10^6
  * documents — millions of grams, not trillions), so its distinct gram-hash
  * set is broadcast and the training corpus — the 100 TB side — is touched
  * by exactly one scan + one broadcast hash join + one aggregation on
  * train_id. No shuffle ever carries training grams; the only exchange is
  * the per-document hit aggregation, whose input is already filtered to
  * contaminated grams (a tiny fraction of the corpus).
  *
  * Gram generation is the native WordShinglesGenerator (zero-copy byte
  * slices, per-document distinct), hashed top-level so the hash runs
  * codegen'd in the fused Generate+Project stage.
  */
object Decontam {

  /** Per-train-document contamination report: every training doc sharing at
    * least one distinct word n-gram with any benchmark doc, with the number
    * of distinct grams hit, the number of benchmark docs involved, and the
    * smallest benchmark doc id (a stable exemplar for triage).
    *
    * Returns (train_id, n_grams_hit, n_bench_docs, first_bench_id).
    * Documents shorter than n tokens produce no grams and cannot be
    * flagged — by construction, matching the published procedure.
    */
  def contaminated(train: DataFrame, bench: DataFrame,
                   idCol: String, textCol: String, n: Int = 13,
                   hash: Column => Column = TextDedup.fastHash): DataFrame = {
    require(n >= 1, "n must be >= 1")
    def gramHashes(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId),
          TextDedup.shingleRows(col(textCol), n))
        .select(col(outId), hash(col("shingle")).as("g"))
    // (bench_id, g) is already distinct: the generator dedups per doc.
    val benchGrams = broadcast(gramHashes(bench, "bench_id"))
    gramHashes(train, "train_id")
      .join(benchGrams, "g")
      .groupBy("train_id")
      .agg(
        countDistinct(col("g")).as("n_grams_hit"),
        countDistinct(col("bench_id")).as("n_bench_docs"),
        min(col("bench_id")).as("first_bench_id"))
  }

  /** The filter most pipelines actually apply: drop contaminated training
    * docs entirely (left-anti against the report).
    */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String, n: Int = 13,
                    hash: Column => Column = TextDedup.fastHash): DataFrame =
    train.join(
      contaminated(train, bench, idCol, textCol, n, hash)
        .select(col("train_id").as(idCol)),
      Seq(idCol), "left_anti")
}
