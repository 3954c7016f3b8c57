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

  /** One left-to-right non-overlapping merge pass applying every pair in
    * `pairs` (an `array<struct<left,right>>` column, broadcast one-row) over
    * a symbol array, as a Catalyst fold. Runs on the vocab table only —
    * interpreted HOF cost is bounded by vocab size, not corpus size.
    * Correct for a SYMBOL-DISJOINT batch (see [[trainMerges]]): a merged
    * symbol's concat string is reserved at selection time, so a newly formed
    * symbol can never be the left side of another pair in the same pass, and
    * one pass is order-invariant = equivalent to applying the pairs
    * sequentially in any order.
    */
  private def mergePassBatch(syms: Column, pairs: Column): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => {
        // get() is 0-based and null-safe on the empty accumulator (ANSI
        // mode makes element_at(acc, -1) throw there)
        val last = get(acc, size(acc) - 1)
        when(size(acc) > 0 &&
            array_contains(pairs, struct(last.as("left"), s.as("right"))),
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(last, s))))
          .otherwise(concat(acc, array(s)))
      })

  /** Train `k` merges, `batch` candidates per Spark round. Returns
    * (merges, segmentation):
    *   merges       — (round, left, right, freq), one row per learned merge;
    *   segmentation — (word, n, syms) with the post-merge symbol arrays,
    *                  ready for [[tokenize]].
    *
    * `batch = 1` is exact Sennrich BPE (recount after every merge) — the
    * oracle-pinned default. `batch = m` selects the top-m pairs by the
    * CURRENT counts, greedily skipping any pair that shares a symbol — or
    * the concat string — with one already selected, then applies them in a
    * single rewrite pass: disjointness makes the batch equivalent to
    * applying its pairs sequentially, so the result is deterministic, and
    * the only divergence from exact BPE is count staleness WITHIN a batch
    * (the standard batched-BPE tradeoff; YouTokenToMe does the same). A
    * production 32k-merge vocab then costs ~32k/m Spark job pairs instead
    * of 32k.
    */
  def trainMerges(df: DataFrame, textCol: String, k: Int,
                  batch: Int = 1): (DataFrame, DataFrame) = {
    require(k >= 1, "k merges >= 1")
    require(batch >= 1, "batch >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = wordVocab(df, textCol)
      .withColumn("syms", initSyms(col("word")))
      .transform(Checkpointer.truncate)
    var merges = Vector.empty[DataFrame]
    var learned = 0
    var exhausted = false
    while (learned < k && !exhausted) {
      val m = math.min(batch, k - learned)
      val n1 = greatest(size(col("syms")) - 1, lit(0))
      val pair = zip_with(
        slice(col("syms"), lit(1), n1), slice(col("syms"), lit(2), n1),
        (a, b) => struct(a.as("l"), b.as("r")))
      // 4m candidates of headroom: interference can reject some; with m=1
      // nothing can be rejected, so the old exact top-1 behavior is intact
      val cands = vocab
        .select(col("n"), explode(pair).as("p"))
        .groupBy(col("p.l").as("left"), col("p.r").as("right"))
        .agg(sum(col("n")).as("freq"))
        .orderBy(desc("freq"), asc("left"), asc("right"))
        .limit(4 * m)
      // greedy disjoint selection on the ≤4m-row candidate table: a single
      // executor task (coalesce(1) + mapPartitions), not a driver collect —
      // re-sorted in place so the selection never depends on arrival order
      val base = learned.toLong
      val selected = cands.as[(String, String, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          val sorted = it.toVector.sortBy { case (l, r, f) => (-f, l, r) }
          val reserved = scala.collection.mutable.Set.empty[String]
          val out = Vector.newBuilder[(Long, String, String, Long)]
          var taken = 0
          sorted.foreach { case (l, r, f) =>
            if (taken < m && !Seq(l, r, l + r).exists(reserved)) {
              reserved ++= Seq(l, r, l + r)
              taken += 1
              out += ((base + taken, l, r, f))
            }
          }
          out.result().iterator
        }
        .toDF("round", "left", "right", "freq")
        .transform(Checkpointer.truncate)
      // k can exceed the learnable merges (every word fully merged): the
      // pair table is then empty and crossJoin(empty) would silently EMPTY
      // the vocab. selected is already materialized, so count is metadata.
      // Interference can also select FEWER than m — advance by the actual
      // count so round numbering stays gapless.
      val got = selected.count().toInt
      if (got == 0) { exhausted = true }
      else {
        val batchRow = selected
          .agg(collect_list(struct(col("left"), col("right"))).as("bp"))
        vocab = vocab
          .crossJoin(broadcast(batchRow))
          .withColumn("syms", mergePassBatch(col("syms"), col("bp")))
          .drop("bp")
          .transform(Checkpointer.truncate) // truncate lineage: chained folds
        merges :+= selected      // grow Catalyst planning super-linearly
        learned += got
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
