package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (PageRank, dedupClusters /
  * dedupClustersStars, BPE trainMerges, IVF centroid training): each round
  * MUST cut its plan lineage or Catalyst planning grows super-linearly in
  * the round count (measured on dedupClusters: a 12-round untruncated
  * lineage took ~13 minutes to PLAN; truncated, seconds).
  *
  * Two strategies, selected per-session by the runtime conf
  * `spark.graft.checkpoint`:
  *
  *   - `local`: eager `localCheckpoint` — blocks live on the
  *     executors that computed them. Fastest (no FS round-trip), but any
  *     executor loss makes the truncated lineage unrecoverable and kills
  *     the job. Right for local mode, short jobs, and reliable clusters.
  *   - `reliable`: eager `checkpoint()` to the SparkContext checkpoint
  *     directory (HDFS / object store) — survives executor loss, the
  *     correct choice for long multi-round jobs on a cluster with churn.
  *     Requires `spark.sparkContext.setCheckpointDir(...)` first; fails
  *     fast with a pointed message otherwise.
  *
  * Default (conf unset): `reliable` whenever a checkpoint directory is
  * configured, `local` otherwise. On a real cluster executor loss
  * mid-iteration is the rule, not the exception — a deployment that went
  * to the trouble of `setCheckpointDir(<durable path>)` wants the
  * loss-tolerant path without also having to know about a second flag;
  * local mode (no checkpoint dir) keeps the fast in-memory behavior.
  *
  * A runtime conf (not a method parameter) so a spark-submit deployment
  * flips it with `--conf spark.graft.checkpoint=local` (or `reliable`)
  * and every iterative op in the job follows — no call-site plumbing.
  */
object Checkpointer {
  val ConfKey = "spark.graft.checkpoint"

  /** Materialize `df` and truncate its lineage per the session conf. */
  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    def reliable(): DataFrame = {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ConfKey=reliable requires " +
          "spark.sparkContext.setCheckpointDir(<durable path>) before the job")
      df.checkpoint(eager = true)
    }
    spark.conf.getOption(ConfKey) match {
      case Some("local")    => df.localCheckpoint(eager = true)
      case Some("reliable") => reliable()
      case Some(other) => throw new IllegalArgumentException(
        s"$ConfKey must be 'local' or 'reliable', got '$other'")
      case None =>
        if (spark.sparkContext.getCheckpointDir.isDefined) reliable()
        else df.localCheckpoint(eager = true)
    }
  }
}
