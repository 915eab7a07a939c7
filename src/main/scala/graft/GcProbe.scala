package graft

import scala.jdk.CollectionConverters._

/** Bimodality diagnosis harness (round-3 verdict #1): one pipeline run in
  * a fresh JVM with GC evidence attached, so the 660k-page/local[32]
  * collapse (runs land at ~105 s or ~248 s, nothing between) can be
  * attributed with data instead of suspicion.
  *
  * `gen` materializes the corpus once; `run` opens a fresh session over
  * it, warms up, times ONE pipeline run, and prints a JSON line with the
  * elapsed time plus the per-collector GC count/time deltas across the
  * timed region, peak heap, and the Spark-reported executor GC time.
  * Intended to be invoked repeatedly via plain `java -cp` (no sbt lock)
  * so foreground work can continue while the evidence accumulates.
  */
object GcProbe {

  private def gcSnapshot(): Map[String, (Long, Long)] =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => b.getName -> (b.getCollectionCount, b.getCollectionTime)).toMap

  /** Box-wide CPU accounting from /proc/stat (USER_HZ ticks): user, nice,
    * system, idle, iowait, irq, softirq, steal. The STEAL column is the
    * hypervisor-co-tenant discriminator: ticks the VM wanted to run but the
    * host gave to someone else.
    */
  private def procStat(): Array[Long] = {
    // wider than Bench.procBusyTicks (this probe needs idle/iowait/steal
    // individually, not just the busy sum) but the handle is closed the
    // same way — a probe that leaks fds per run is its own co-tenant
    val src = scala.io.Source.fromFile("/proc/stat")
    try src.getLines().next().split("\\s+").drop(1).take(8).map(_.toLong)
    finally src.close()
  }

  /** This JVM's cumulative CPU nanoseconds (sum of all threads). */
  private def processCpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("run")
    val path = args.lift(1).getOrElse("/tmp/graft-gcprobe-corpus")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val numBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "60000").toLong

    mode match {
      case "gen" =>
        val spark = Bench.sessionFor("32")
        Bench.materializePages(spark, math.max(50L, numBase / 20), s"$path/warm")
        Bench.materializePages(spark, numBase, s"$path/full")
        spark.stop()
        println(s"""{"generated":"$path","num_base":$numBase}""")

      case "run" =>
        val spark = Bench.sessionFor(cpus)
        // Spark-side executor GC accounting (local mode: same JVM, but the
        // task-time denominator makes it a rate, comparable across runs)
        var taskTimeMs = 0L
        var taskCpuNs = 0L
        var gcTimeMs = 0L
        var peakMem = 0L
        var nTasks = 0L
        var nFailedTasks = 0L
        var nStageAttemptRetries = 0L
        var spillBytes = 0L
        var shuffleReadB = 0L
        var shuffleWriteB = 0L
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
              nTasks += 1
              if (!e.taskInfo.successful) nFailedTasks += 1
              if (e.taskMetrics != null) {
                taskTimeMs += e.taskMetrics.executorRunTime
                taskCpuNs += e.taskMetrics.executorCpuTime
                gcTimeMs += e.taskMetrics.jvmGCTime
                peakMem = math.max(peakMem, e.taskMetrics.peakExecutionMemory)
                spillBytes += e.taskMetrics.memoryBytesSpilled
                shuffleReadB += e.taskMetrics.shuffleReadMetrics.totalBytesRead
                shuffleWriteB += e.taskMetrics.shuffleWriteMetrics.bytesWritten
              }
            }
            override def onStageCompleted(
                s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
              if (s.stageInfo.attemptNumber() > 0) nStageAttemptRetries += 1
          })
        Bench.runPipelineOn(spark, s"$path/warm")
        Bench.dropPipelineState(spark)
        // drain the ASYNC listener bus before zeroing: straggler warm-run
        // task-end events would otherwise land after the reset and be
        // attributed to the timed window (same discipline as
        // TaskSkewListener.measure / ScalingProfile)
        org.apache.spark.sql.graftshim.shim.drainListenerBus(spark.sparkContext, 30000)
        taskTimeMs = 0; taskCpuNs = 0; gcTimeMs = 0; peakMem = 0
        nTasks = 0; nFailedTasks = 0; nStageAttemptRetries = 0
        spillBytes = 0; shuffleReadB = 0; shuffleWriteB = 0

        val gc0 = gcSnapshot()
        val stat0 = procStat()
        val pcpu0 = processCpuNs()
        val heap0 = java.lang.management.ManagementFactory.getMemoryMXBean
          .getHeapMemoryUsage.getUsed
        val t0 = System.nanoTime()
        Bench.runPipelineOn(spark, s"$path/full")
        val sec = (System.nanoTime() - t0) / 1e9
        val stat1 = procStat()
        val pcpu1 = processCpuNs()
        val gc1 = gcSnapshot()
        val heap1 = java.lang.management.ManagementFactory.getMemoryMXBean
          .getHeapMemoryUsage

        // let straggling task-end events drain before reading the counters
        org.apache.spark.sql.graftshim.shim.drainListenerBus(spark.sparkContext, 30000)
        val gcs = gc1.map { case (name, (c1, t1)) =>
          val (c0, tt0) = gc0.getOrElse(name, (0L, 0L))
          f""""${name.replace(' ', '_')}":{"n":${c1 - c0},"ms":${t1 - tt0}}"""
        }.mkString(",")
        val xmx = Runtime.getRuntime.maxMemory
        spark.stop()
        // box-wide accounting over the timed window: whose CPU was it?
        val d = stat0.indices.map(i => stat1(i) - stat0(i))
        val ticksTotal = math.max(1L, d.sum)
        val Seq(dUser, dNice, dSys, dIdle, dIowait, dIrq, dSoftirq, dSteal) =
          d.toSeq.padTo(8, 0L)
        val ownCpuSec = (pcpu1 - pcpu0) / 1e9
        val busySec = (dUser + dNice + dSys + dIrq + dSoftirq) / 100.0
        println(f"""{"cpus":$cpus,"sec":$sec%.2f,"gc":{$gcs},""" +
          f""""task_time_ms":$taskTimeMs,"task_cpu_ms":${taskCpuNs / 1000000},""" +
          f""""task_gc_ms":$gcTimeMs,""" +
          f""""gc_frac_of_task_time":${if (taskTimeMs > 0) gcTimeMs.toDouble / taskTimeMs else 0.0}%.4f,""" +
          f""""n_tasks":$nTasks,"n_failed_tasks":$nFailedTasks,""" +
          f""""n_stage_retries":$nStageAttemptRetries,""" +
          f""""spill_mb":${spillBytes / 1024 / 1024},""" +
          f""""shuffle_read_mb":${shuffleReadB / 1024 / 1024},""" +
          f""""shuffle_write_mb":${shuffleWriteB / 1024 / 1024},""" +
          f""""own_proc_cpu_sec":$ownCpuSec%.1f,"box_busy_cpu_sec":$busySec%.1f,""" +
          f""""other_proc_cpu_sec":${math.max(0.0, busySec - ownCpuSec)}%.1f,""" +
          f""""steal_frac":${dSteal.toDouble / ticksTotal}%.4f,""" +
          f""""idle_frac":${dIdle.toDouble / ticksTotal}%.4f,""" +
          f""""iowait_frac":${dIowait.toDouble / ticksTotal}%.4f,""" +
          f""""peak_exec_mem_mb":${peakMem / 1024 / 1024},""" +
          f""""heap_used_before_mb":${heap0 / 1024 / 1024},""" +
          f""""heap_used_after_mb":${heap1.getUsed / 1024 / 1024},""" +
          f""""heap_committed_mb":${heap1.getCommitted / 1024 / 1024},""" +
          f""""xmx_mb":${xmx / 1024 / 1024}}""")

      case other => sys.error(s"unknown mode $other (gen|run)")
    }
  }
}
