package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-cutting materialization strategy for the pipeline's checkpoint
  * sites (pair sets, union-find rounds, id dictionaries, cluster tables).
  *
  * Two modes:
  *
  *  - LOCAL (default): `localCheckpoint` — blocks live on executor
  *    block managers. Fastest, but blocks die with their executor, so a
  *    single preempted node makes a multi-hour run unrecoverable.
  *  - RELIABLE: `checkpoint` to `sparkContext`'s checkpoint dir (HDFS/
  *    S3A/...): blocks survive executor loss; a lost task recomputes from
  *    the checkpoint files instead of replaying the whole DAG. This is the
  *    posture for preemptible/spot clusters — the Spark-side analog of the
  *    reference's crash-resumable store commits (image-deduper
  *    `src/persistence/db.rs:64-92`).
  *
  * The `eager = false` variant defers materialization to the caller's next
  * action (the pipeline pairs every lazy checkpoint with an aggregation
  * job that materializes it), which holds for both modes.
  *
  * Checkpoint files are reclaimed when the SparkContext stops (or by
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`); point the dir
  * at a job-scoped path so an operator can clean up by deleting one tree.
  */
final class Materializer private (val reliable: Boolean,
                                  checkpointDir: String = "") extends Serializable {
  def apply(df: DataFrame, eager: Boolean = true): DataFrame =
    if (reliable) {
      // re-assert the dir at every materialization: setCheckpointDir is
      // SparkContext-GLOBAL, so another reliable materializer constructed
      // since (a second pipeline in the same session) would otherwise
      // silently redirect this one's checkpoints under ITS tree — and the
      // documented "clean up by deleting one tree" contract would delete
      // files a live run still depends on. (Two reliable pipelines
      // materializing CONCURRENTLY on one driver still race the global —
      // point them at one shared dir in that deployment.)
      df.sparkSession.sparkContext.setCheckpointDir(checkpointDir)
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
}

object Materializer {

  /** Executor-local blocks: fast, not executor-loss-safe. */
  val local: Materializer = new Materializer(false)

  /** Reliable checkpoints rooted at `checkpointDir` (any Hadoop FS URI). */
  def reliable(spark: SparkSession, checkpointDir: String): Materializer = {
    require(checkpointDir.nonEmpty,
      "reliable checkpoint mode needs a checkpoint dir (DedupConfig.checkpointDir)")
    spark.sparkContext.setCheckpointDir(checkpointDir)
    new Materializer(true, checkpointDir)
  }
}
