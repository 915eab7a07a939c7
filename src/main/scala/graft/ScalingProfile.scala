package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler._

/** Attribution companion to [[ScalingBench]]: runs the identical timed
  * pipeline at each master shape with a listener that decomposes the wall
  * into (a) per-job intervals, (b) per-stage wall / task-time / occupancy,
  * and (c) DRIVER GAP — wall covered by no running job (planning, action
  * round-trips, result handling). A stage whose wall does not shrink from
  * N to 4N cores, or a large constant driver gap, is exactly the
  * non-scaling term the normalized-efficiency number pays for. Not part of
  * the driver contract — a tuning tool; findings land in BASELINE.md.
  */
object ScalingProfile {

  final case class StageAgg(var name: String = "", var submitted: Long = 0L,
                            var completed: Long = 0L, var tasks: Int = 0,
                            var taskTimeMs: Long = 0L, var cpuMs: Long = 0L,
                            var shuffleReadMb: Double = 0, var shuffleWriteMb: Double = 0,
                            var maxTaskMs: Long = 0L, var details: String = "",
                            var maxTaskRecords: Long = 0L, var maxTaskReadMb: Double = 0)

  final class ProfListener extends SparkListener {
    val stages = new ConcurrentHashMap[Int, StageAgg]()
    val jobIntervals = new ConcurrentHashMap[Int, (Long, Long)]()
    private def agg(id: Int) = stages.computeIfAbsent(id, _ => StageAgg())

    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
      val a = agg(e.stageInfo.stageId)
      a.name = e.stageInfo.name
      a.details = e.stageInfo.details
      a.submitted = e.stageInfo.submissionTime.getOrElse(System.currentTimeMillis())
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val a = agg(e.stageInfo.stageId)
      a.name = e.stageInfo.name
      a.completed = e.stageInfo.completionTime.getOrElse(System.currentTimeMillis())
      if (a.submitted == 0L) a.submitted = e.stageInfo.submissionTime.getOrElse(a.completed)
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        val a = agg(e.stageId)
        a.synchronized {
          a.tasks += 1
          a.taskTimeMs += m.executorRunTime
          a.cpuMs += m.executorCpuTime / 1000000L
          a.shuffleReadMb += m.shuffleReadMetrics.totalBytesRead / 1e6
          a.shuffleWriteMb += m.shuffleWriteMetrics.bytesWritten / 1e6
          if (m.executorRunTime > a.maxTaskMs) {
            a.maxTaskMs = m.executorRunTime
            a.maxTaskRecords = m.shuffleReadMetrics.recordsRead
            a.maxTaskReadMb = m.shuffleReadMetrics.totalBytesRead / 1e6
          }
        }
      }
    }
    override def onJobStart(e: SparkListenerJobStart): Unit =
      jobIntervals.put(e.jobId, (e.time, 0L))
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val prev = jobIntervals.get(e.jobId)
      if (prev != null) jobIntervals.put(e.jobId, (prev._1, e.time))
    }
  }

  /** Wall milliseconds in [t0, t1] covered by no interval in `iv`. */
  def uncovered(t0: Long, t1: Long, iv: Seq[(Long, Long)]): Long = {
    val sorted = iv.filter(i => i._2 > i._1).sortBy(_._1)
    var cursor = t0; var gap = 0L
    sorted.foreach { case (s, e) =>
      if (s > cursor) gap += math.min(s, t1) - cursor
      cursor = math.max(cursor, math.min(e, t1))
    }
    if (t1 > cursor) gap += t1 - cursor
    gap
  }

  def main(args: Array[String]): Unit = {
    val numBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "20000").toLong
    val masters = sys.env.getOrElse("SPARK_GRAFT_MASTERS",
      "local-cluster[1,8,8192]|local-cluster[4,8,8192]")
      .split('|').map(_.trim).filter(_.nonEmpty).toSeq
    masters.foreach(Bench.coresOf)

    val tmp = Files.createTempDirectory("graft-sprof").toString
    val gen = Bench.sessionFor("32")
    val warmPath = Bench.materializePages(gen, math.max(50L, numBase / 20), s"$tmp/warm")
    val fullPath = Bench.materializePages(gen, numBase, s"$tmp/full")
    gen.stop()

    // differential-attribution knobs: rerun with one stage disabled/shrunk to
    // see which one owns the straggler (CPU-heavy skew carries no byte
    // signature, so the listener alone can't name the operator)
    val cfg0 = graft.pipeline.DedupConfig()
    val cfg = cfg0.copy(
      containmentGate = sys.env.get("GRAFT_PROF_CONT_GATE").map(_.toDouble)
        .getOrElse(cfg0.containmentGate),
      anchorModulus = sys.env.get("GRAFT_PROF_ANCHOR").map(_.toInt)
        .getOrElse(cfg0.anchorModulus),
      estimateTier = sys.env.get("GRAFT_PROF_EST").map(_.toBoolean)
        .getOrElse(cfg0.estimateTier),
      saMaxChars = sys.env.get("GRAFT_PROF_SA_CHARS").map(_.toInt)
        .getOrElse(cfg0.saMaxChars),
      simhashAcceptHamming = sys.env.get("GRAFT_PROF_ACCEPT_HAMMING").map(_.toInt)
        .getOrElse(cfg0.simhashAcceptHamming))

    masters.foreach { master =>
      val cores = Bench.coresOf(master)
      val spark = Bench.sessionForMaster(master)
      Bench.runPipelineOn(spark, warmPath, cfg)
      Bench.dropPipelineState(spark)
      val l = new ProfListener
      spark.sparkContext.addSparkListener(l)
      val t0w = System.currentTimeMillis()
      val t0 = System.nanoTime()
      Bench.runPipelineOn(spark, fullPath, cfg)
      val sec = (System.nanoTime() - t0) / 1e9
      val t1w = System.currentTimeMillis()
      org.apache.spark.sql.graftshim.shim.drainListenerBus(spark.sparkContext, 30000)
      spark.sparkContext.removeSparkListener(l)

      import scala.jdk.CollectionConverters._
      val stages = l.stages.values.asScala.toSeq.filter(_.completed > 0)
      val jobs = l.jobIntervals.asScala.toSeq.sortBy(_._1)
      val gapMs = uncovered(t0w, t1w, jobs.map(_._2))
      val nJobs = jobs.size

      println(f"%n=== $master  wall ${sec}%.2f s  jobs $nJobs  driver-gap ${gapMs / 1000.0}%.2f s ===")
      println(f"${"stage"}%-9s ${"wall_s"}%7s ${"task_s"}%8s ${"cpu_s"}%8s ${"occ"}%5s ${"tasks"}%5s ${"maxT_s"}%7s ${"shR_MB"}%8s  name")
      stages.sortBy(s => -(s.completed - s.submitted)).take(28).foreach { s =>
        val wall = (s.completed - s.submitted) / 1000.0
        val occ = if (wall > 0) s.taskTimeMs / 1000.0 / (wall * cores) else 0.0
        println(f"${s.submitted - t0w}%9d ${wall}%7.2f ${s.taskTimeMs / 1000.0}%8.2f ${s.cpuMs / 1000.0}%8.2f ${occ}%5.2f ${s.tasks}%5d ${s.maxTaskMs / 1000.0}%7.2f ${s.shuffleReadMb}%8.1f  ${s.name.take(70)}")
      }
      // call-site attribution for the heaviest stages: the graft/Spark-SQL
      // frames from the stage's full details stack, which name the operator
      println("\n-- top-3 stage call sites --")
      stages.sortBy(s => -(s.completed - s.submitted)).take(3).foreach { s =>
        val frames = s.details.split('\n')
          .filter(l => l.contains("graft.") || l.contains("Dataset") || l.contains("SQLExecution"))
          .take(8)
        println(f"stage@${s.submitted - t0w} maxTask=${s.maxTaskMs / 1000.0}%.2fs " +
          f"maxTaskRecords=${s.maxTaskRecords} maxTaskReadMb=${s.maxTaskReadMb}%.1f")
        frames.foreach(f => println("    " + f.trim))
      }
      val stageWall = stages.map(s => s.completed - s.submitted).sum / 1000.0
      val taskTot = stages.map(_.taskTimeMs).sum / 1000.0
      println(f"TOTALS: stage-wall(sum) $stageWall%.2f s, task-time $taskTot%.2f s, " +
        f"mean-occupancy ${taskTot / (sec * cores)}%.2f of $cores cores, " +
        f"jobs $nJobs, driver-gap ${gapMs / 1000.0}%.2f s")
      spark.stop()
    }
  }
}
