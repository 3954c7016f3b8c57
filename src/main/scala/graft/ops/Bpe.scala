package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training (Sennrich et al. 2016) —
  * the tokenizer-construction step of a training-data pipeline.
  *
  * The trick that makes BPE tractable at corpus scale is the same one the
  * original paper uses: all rounds run on the DISTINCT-WORD table weighted
  * by word frequency, not on the corpus. One corpus-sized aggregate builds
  * the vocab; after that, every round costs (a) a pair-count aggregate over
  * the vocab, (b) a global top-1 (TakeOrdered — no full sort), and (c) a
  * scan-side symbol-array rewrite. The winning merge pair is carried as a
  * broadcast ONE-ROW table into the rewrite — no collect(), nothing
  * driver-side but job control.
  *
  * Determinism contract: ties on pair frequency break lexicographically on
  * (left, right); the rewrite merges occurrences left-to-right,
  * non-overlapping (the fold below does exactly that in one pass: a newly
  * formed symbol never equals the bare left symbol, so a merged prefix
  * cannot be re-consumed). Words carry a terminal "</w>" symbol so
  * end-of-word merges stay distinct from mid-word ones, as in the paper.
  */
object Bpe {

  /** Initial symbol sequence of a word: its characters plus "</w>". */
  def initSyms(word: Column): Column =
    concat(split(word, ""), array(lit("</w>")))

  /** (word, n) frequency table — the only corpus-sized aggregate. */
  def wordVocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** One left-to-right non-overlapping merge pass of (ml, mr) over a
    * symbol array, as a Catalyst fold. Runs on the vocab table only —
    * interpreted HOF cost is bounded by vocab size, not corpus size.
    */
  private def mergePass(syms: Column, ml: Column, mr: Column): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        // get() is 0-based and null-safe on the empty accumulator (ANSI
        // mode makes element_at(acc, -1) throw there)
        get(acc, size(acc) - 1) === ml && s === mr,
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(ml, mr)))).otherwise(concat(acc, array(s))))

  /** Train `k` merges. Returns (merges, segmentation):
    *   merges       — (round, left, right, freq), one row per learned merge;
    *   segmentation — (word, n, syms) with the post-merge symbol arrays,
    *                  ready for [[tokenize]].
    */
  def trainMerges(df: DataFrame, textCol: String, k: Int): (DataFrame, DataFrame) = {
    require(k >= 1, "k merges >= 1")
    var vocab = wordVocab(df, textCol)
      .withColumn("syms", initSyms(col("word")))
      .transform(Checkpointer.truncate)
    var merges = Vector.empty[DataFrame]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val n1 = greatest(size(col("syms")) - 1, lit(0))
      val pair = zip_with(
        slice(col("syms"), lit(1), n1), slice(col("syms"), lit(2), n1),
        (a, b) => struct(a.as("l"), b.as("r")))
      val best = vocab
        .select(col("n"), explode(pair).as("p"))
        .groupBy(col("p.l").as("left"), col("p.r").as("right"))
        .agg(sum(col("n")).as("freq"))
        .orderBy(desc("freq"), asc("left"), asc("right"))
        .limit(1)
        .select(lit(r.toLong).as("round"), col("left"), col("right"), col("freq"))
        .transform(Checkpointer.truncate)
      // k can exceed the learnable merges (every word fully merged): the
      // pair table is then empty and crossJoin(empty) would silently EMPTY
      // the vocab. best is already materialized, so isEmpty is metadata.
      if (best.isEmpty) { exhausted = true }
      else {
        vocab = vocab
          .crossJoin(broadcast(best.select(col("left").as("ml"), col("right").as("mr"))))
          .withColumn("syms", mergePass(col("syms"), col("ml"), col("mr")))
          .drop("ml", "mr")
          .transform(Checkpointer.truncate) // truncate lineage: k chained folds otherwise
        merges :+= best          // grow Catalyst planning super-linearly
        r += 1
      }
    }
    (merges.reduceOption(_ union _).getOrElse(emptyMerges(df)), vocab)
  }

  /** Zero-row merges frame with the trainMerges schema, for the
    * nothing-learnable case (e.g. an empty corpus).
    */
  private def emptyMerges(df: DataFrame): DataFrame =
    df.sparkSession.range(0).select(
      col("id").as("round"), lit("").as("left"), lit("").as("right"),
      col("id").as("freq"))

  /** Tokenize a corpus with a learned segmentation: one equi-join of the
    * exploded corpus against the (broadcast-sized) vocab segmentation, then
    * per-doc reassembly in word order. Emits (id, n_tokens, tokens) with
    * tokens space-joined.
    */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               segmentation: DataFrame): DataFrame = {
    val id = col(idCol)
    df.select(id, posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
      .join(segmentation.select("word", "syms"), Seq("word"))
      .groupBy(id)
      .agg(
        sum(size(col("syms"))).cast("long").as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("syms")))),
            s => array_join(s.getField("syms"), " ")),
          " ").as("tokens"))
  }
}
