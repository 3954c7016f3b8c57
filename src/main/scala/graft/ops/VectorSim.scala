package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * All scoring runs on QUANTIZED integer vectors (floor(x*scale + 0.5) as
  * BIGINT): dot products and norms become exact integer arithmetic, so
  * results are bit-reproducible across engines, partitionings, and cluster
  * sizes — no float-summation-order drift. At 100 TB that reproducibility is
  * what makes near-dup thresholds and top-k cutoffs stable between runs
  * (and lets DuckDB serve as an oracle). Cosine = dot/(sqrt(na)*sqrt(nb))
  * is computed once per pair from those exact integers.
  *
  * Scale paths:
  *   - brute-force top-k: broadcast the (small) query set against the full
  *     corpus — one pass, no shuffle of the big side;
  *   - LSH buckets: sign-random-projection signatures give an equi-joinable
  *     bucket key, turning ANN into a shuffle-friendly candidate join.
  */
object VectorSim {

  /** Quantize array<float> → array<bigint>, exact in any engine. */
  def quantize(emb: Column, scale: Int = 1000): Column =
    transform(emb, x => floor(x.cast("double") * scale + 0.5).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)

  /** Cosine from quantized vectors (double, deterministic given exact ints). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b).cast("double") / (sqrt(dot(a, a).cast("double")) * sqrt(dot(b, b).cast("double")))

  /** Brute-force cosine top-k: every corpus vector scored against every
    * query vector. `queries` should be small — it is broadcast, so the
    * corpus side never shuffles; ranking shuffles only (query_id, k) rows.
    * Ties broken by neighbor id for determinism.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 embCol: String, k: Int = 5, scale: Int = 1000): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), quantize(col(embCol), scale).as("v"))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(embCol), scale).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        cosine(col("qv"), col("v")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic "random" hyperplane weight for (plane j, dim i):
    * Knuth-hash the index pair into a small signed integer. Data, not
    * runtime randomness — reproducible everywhere.
    */
  def planeWeight(j: Column, i: Column): Column =
    pmod(pmod((j * 64 + i) * 2654435761L, lit(1000003L)), lit(19L)) - 9L

  /** Sign-random-projection LSH signature (`planes` bits) of a quantized
    * vector: bit j = [dot(plane_j, v) > 0].
    */
  def lshSignature(v: Column, planes: Int = 16): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, j) => {
        val d = aggregate(
          zip_with(v, sequence(lit(1), size(v)), (x, i) => x * planeWeight(j, i)),
          lit(0L), _ + _)
        acc + when(d > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)
      })

  /** Bucket the corpus by LSH signature: (bucket, n_vecs, min id). The
    * 100 TB path: signature is computed scan-side (no shuffle), bucketing is
    * one hash aggregation; queries then only probe their own bucket.
    */
  def lshBuckets(corpus: DataFrame, idCol: String, embCol: String,
                 planes: Int = 16, scale: Int = 1000): DataFrame =
    corpus.select(col(idCol).as("id"),
        lshSignature(quantize(col(embCol), scale), planes).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"), min(col("id")).as("min_id"))

  /** ANN top-k via LSH: candidates share the query's bucket; exact cosine
    * rerank within bucket. Returns fewer than k when a bucket is small —
    * the standard recall/cost trade documented with the operator.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, k: Int = 5, planes: Int = 8,
              scale: Int = 1000): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), quantize(col(embCol), scale).as("v"))
      .withColumn("bucket", lshSignature(col("v"), planes))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(embCol), scale).as("qv"))
      .withColumn("bucket", lshSignature(col("qv"), planes))
    val cA = c.alias("c"); val qA = q.alias("q")
    val cand = cA.join(broadcast(qA),
        col("c.bucket") === col("q.bucket") && col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"), cosine(col("qv"), col("v")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("nbr_id"))
    cand.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold. Brute-force
    * O(n^2) formulation: the join has no equi key, so Catalyst plans a
    * BroadcastNestedLoopJoin — kept ONLY as the small-scale reference
    * formulation (it is the DuckDB oracle's shape). Production path:
    * [[nearDupPairsBlocked]]. Self-pairs excluded, a < b.
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, embCol: String,
                   minCosine: Double, scale: Int = 1000): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), quantize(col(embCol), scale).as("v"))
    val a = c.alias("a"); val b = c.alias("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("score"))
      .where(col("score") >= minCosine)
  }

  /** Exact near-dup pairs via a block-replicated theta join (the 1-Bucket
    * theta-join of Okcan & Riedewald, SIGMOD 2011): every vector lands in
    * block g = hash(id) % B; the left role replicates each vector to keys
    * (g, j) ∀j and the right role to keys (i, g) ∀i, so each unordered pair
    * meets at exactly one (block_a, block_b) key in exactly one id order.
    * The join is a plain equi-join on the key — shuffle-partitioned, skew-
    * free by construction ((n/B)² comparisons per key over B² keys), no
    * BroadcastNestedLoopJoin, no driver-side anything.
    *
    * Same output as [[nearDupPairs]], bit for bit. The pairwise work is
    * still Θ(n²/p) — inherent to an all-pairs threshold at low cosine
    * (measured on the test embeddings: qualifying pairs sit at cosine
    * ≈0.30–0.60, where SRP-LSH bit-agreement is ~0.6/plane, so no LSH
    * banding can guarantee exact recall). When approximate recall is
    * acceptable, [[annTopK]]/[[lshBuckets]] are the sub-quadratic path.
    */
  def nearDupPairsBlocked(corpus: DataFrame, idCol: String, embCol: String,
                          minCosine: Double, blocks: Int = 16,
                          scale: Int = 1000): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), quantize(col(embCol), scale).as("v"),
      pmod(xxhash64(col(idCol)), lit(blocks)).cast("int").as("g"))
    val all = sequence(lit(0), lit(blocks - 1))
    val left = c.select(col("id"), col("v"),
      col("g").as("ba"), explode(all).as("bb"))
    val right = c.select(col("id"), col("v"),
      explode(all).as("ba"), col("g").as("bb"))
    val a = left.alias("a"); val b = right.alias("b")
    a.join(b,
        col("a.ba") === col("b.ba") && col("a.bb") === col("b.bb") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("score"))
      .where(col("score") >= minCosine)
  }
}
