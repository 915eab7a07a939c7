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
  * Reliable checkpoint files are NOT reclaimed when the SparkContext
  * stops — Spark leaves them on the FS, and
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` reclaims one
  * only when its RDD reference is GC'd on a live driver. Point the dir at
  * a job-scoped path and DELETE THE TREE after the run (the CLI's default
  * `<state>/_spark_checkpoints` keeps it inside the one state dir an
  * operator already manages); a nightly pipeline that never deletes it
  * accumulates every run's pair-set/union-find state forever.
  */
final class Materializer private (val reliable: Boolean,
                                  checkpointDir: String = "") extends Serializable {
  def apply(df: DataFrame, eager: Boolean = true): DataFrame =
    if (reliable) {
      // re-assert the dir when the GLOBAL one points elsewhere:
      // setCheckpointDir is SparkContext-global, so another reliable
      // materializer constructed since (a second pipeline in the same
      // session) would otherwise silently redirect this one's checkpoints
      // under ITS tree — and the documented "clean up by deleting one
      // tree" contract would delete files a live run still depends on.
      // Guarded, not unconditional: every setCheckpointDir call mkdirs a
      // FRESH random-UUID subdir, so per-materialization re-assertion paid
      // a remote-FS round-trip per checkpoint site and scattered one run's
      // checkpoints across as many UUID trees. (Two reliable pipelines
      // materializing CONCURRENTLY on one driver still race the global —
      // point them at one shared dir in that deployment.)
      val sc = df.sparkSession.sparkContext
      val p = new org.apache.hadoop.fs.Path(checkpointDir)
      val qualified =
        p.getFileSystem(sc.hadoopConfiguration).makeQualified(p).toString
      val current = sc.getCheckpointDir // qualified, with the UUID leaf
      if (!current.exists(c =>
          new org.apache.hadoop.fs.Path(c).getParent.toString == qualified))
        sc.setCheckpointDir(checkpointDir)
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
