package graft

import java.nio.file.Files

/** Scaling-efficiency evidence for the north_rule's two-cluster-size
  * criterion, mapped in-sandbox to parallelism SHAPES: the identical dedup
  * job on the IDENTICAL materialized input at each master spec in
  * `SPARK_GRAFT_MASTERS` (pipe-separated; default `local[8]|local[32]`).
  *
  * Two shape families (`Bench.sessionForMaster`):
  *  - `local[N]` — one JVM, N threads: the fat-executor shape.
  *  - `local-cluster[n,c,m]` — n REAL executor JVMs × c cores × m MB: the
  *    multi-small-executor shape the round-4 heap diagnosis prescribes.
  *    `local-cluster[1,8,8192]` vs `local-cluster[4,8,8192]` is the closest
  *    this sandbox gets to the rule's actual N vs 4N executors: disjoint
  *    executor processes, each with its own G1 over its own capped heap,
  *    shuffling over real serialization boundaries.
  *
  * Efficiency between every core-increasing shape pair =
  * throughput(high) / (ratio × throughput(low)). The corpus is generated
  * and written to parquet ONCE, outside all measurements. Prints one JSON
  * line; numbers are recorded in BASELINE.md.
  */
object ScalingBench {

  /** Hardware parallel-scaling ceiling: an embarrassingly-parallel,
    * shuffle-free CPU-bound Spark job (chained sha2 over a range) at the
    * same shapes. On this sandbox VM, all-core clocks are lower than
    * few-core clocks (frequency scaling), so even perfect code cannot reach
    * efficiency 1.0 between 8 and 32 busy cores — this measures what
    * "perfect" actually is here, and the pipeline's normalized efficiency
    * is reported against it. (On a real multi-executor cluster — the
    * north_rule's setting — the two sizes run on disjoint machines and this
    * coupling disappears.)
    */
  def cpuCeilingSecs(master: String, rows: Long): Double = {
    val spark = Bench.sessionForMaster(master)
    spark.range(rows / 10).selectExpr("sha2(cast(id as string), 256) as h")
      .selectExpr("sum(length(h))").collect() // warmup
    val secs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(rows)
        .selectExpr("sha2(cast(id as string), 256) as h")
        .selectExpr("sha2(h, 256) as h").selectExpr("sha2(h, 256) as h")
        .selectExpr("sum(length(h))").collect()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    spark.stop()
    secs(1) // median of 3
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON output: decimal points, any host locale
    // round-4 diagnosis (BASELINE.md): a large Xmx lets G1 ergonomics
    // expand the heap instead of collecting, and the dispersed heap
    // inflates task CPU up to 2.25× via memory stalls — the measured cause
    // of the 660k/local[32] run-time bimodality. Scaling numbers are only
    // comparable in the dense-heap regime. (local-cluster executors cap
    // their own heaps; this guards the fat local[N] shapes + the driver.)
    if (Runtime.getRuntime.maxMemory > 20L * 1024 * 1024 * 1024)
      System.err.println(
        "[scaling] WARNING: Xmx > 20g puts G1 in the heap-expansion regime " +
          "(BASELINE.md round 4: memory-stall CPU inflation, bimodal runs); " +
          "set SPARK_DRIVER_MEM=16g for comparable measurements")
    val numBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "20000").toLong
    val ceilRows = sys.env.getOrElse("SPARK_GRAFT_CEIL_ROWS", "40000000").toLong
    val nPages = numBase * graft.pages.PagesGen.variantKinds.length
    val masters = sys.env.getOrElse("SPARK_GRAFT_MASTERS", "local[8]|local[32]")
      .split('|').map(_.trim).filter(_.nonEmpty).toSeq
    masters.foreach(Bench.coresOf) // fail fast on a typo before generating

    // SPARK_GRAFT_SCALE_JOB selects the measured job: "pipeline" (default,
    // the dedup end-to-end) or "battery" (the round-5 cleaning battery over
    // the sentence-structured derived corpus) — the same two-parallelism
    // protocol applies to whichever operator class is under test
    val job = sys.env.getOrElse("SPARK_GRAFT_SCALE_JOB", "pipeline")
    require(job == "pipeline" || job == "battery", s"unknown scale job: $job")

    val tmp = Files.createTempDirectory("graft-scale").toString
    val gen = Bench.sessionFor("32")
    var warmPath = Bench.materializePages(gen, math.max(50L, numBase / 20), s"$tmp/warm")
    var fullPath = Bench.materializePages(gen, numBase, s"$tmp/full")
    if (job == "battery") {
      warmPath = Bench.materializeBattery(gen, warmPath, s"$tmp/warm_battery")
      fullPath = Bench.materializeBattery(gen, fullPath, s"$tmp/full_battery")
    }
    gen.stop()
    def runJob(spark: org.apache.spark.sql.SparkSession, path: String): Long =
      if (job == "battery") Bench.runBatteryOn(spark, path)
      else Bench.runPipelineOn(spark, path)

    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt

    // one timed run in a fresh session (fresh JIT/executor state is
    // equalized by a 1/20-size warmup run first — in local-cluster mode the
    // warmup also absorbs executor-JVM launch + class distribution).
    // Each run carries its own attribution evidence (same discriminators as
    // the Bench skew reps): total task CPU and GC from the listener bus, and
    // box-wide other-process CPU across the run window — so a memory-bound
    // regime (task CPU inflated at flat data) or a co-tenant burst (wall up
    // at flat task CPU) is visible IN the recorded JSON, not inferred later.
    final case class Run(sec: Double, taskCpuSec: Double, gcSec: Double,
                         otherProcCpuSec: Double)
    def timeOne(master: String, i: Int): Run = {
      val spark = Bench.sessionForMaster(master)
      runJob(spark, warmPath)
      Bench.dropPipelineState(spark)
      // NOTE: in local-cluster mode ownCpuNs sees only the DRIVER process;
      // executor CPU is attributed via the task metrics, and the "other
      // proc" estimate legitimately includes the executor JVMs' overhead
      // (GC threads, shuffle service) — read it as an upper bound there.
      val busy0 = Bench.procBusyTicks(); val own0 = Bench.ownCpuNs()
      val t0 = System.nanoTime()
      val (_, l) = TaskSkewListener.measure(spark) {
        runJob(spark, fullPath)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val taskCpu = l.totalTaskCpuNs.get() / 1e9
      // "other processes" residual = box busy − this JVM − out-of-process
      // task CPU. Under local[N] the tasks run INSIDE the driver JVM, so
      // ownCpuNs already contains taskCpu — subtracting it again would
      // double-count and clamp a real co-tenant burst to ~0 (defeating the
      // attribution the metric exists for). Only local-cluster executors
      // burn task CPU outside this process.
      val outOfProcTaskCpu = if (master.startsWith("local-cluster")) taskCpu else 0.0
      val other = math.max(0.0,
        (Bench.procBusyTicks() - busy0) / 100.0 - (Bench.ownCpuNs() - own0) / 1e9 -
          outOfProcTaskCpu)
      spark.stop()
      System.err.println(f"[scaling] $master run $i: $sec%.2f s " +
        f"(taskCpu ${taskCpu}%.0f s, gc ${l.totalGcMs.get() / 1e3}%.0f s, other ${other}%.0f s)")
      Run(sec, taskCpu, l.totalGcMs.get() / 1e3, other)
    }

    // INTERLEAVED medians: the sandbox VM's throughput drifts minute-to-
    // minute (shared tenancy), so running all reps of one shape before the
    // next would let the drift masquerade as a scaling/shape effect.
    // Cycling through every shape per rep puts all shapes in the same
    // minutes; medians of N then cancel symmetric noise.
    val fullRuns: Seq[Seq[Run]] = // fullRuns(shapeIdx)(rep)
      (1 to reps).map(i => masters.map(m => timeOne(m, i))).transpose
    val runs: Seq[Seq[Double]] = fullRuns.map(_.map(_.sec))
    val med = runs.map(Bench.median)
    // co-tenant interference is strictly ADDITIVE, so the min over reps
    // estimates the uncontended capability of each shape — reported
    // alongside the medians, never in place of them
    val best = runs.map(_.min)
    val tp = med.map(nPages / _)

    val ceil = masters.map(m => cpuCeilingSecs(m, ceilRows))

    // efficiency for every core-increasing ordered pair, plus the perfect-
    // job ceiling ratio and the normalized (pipeline / ceiling) number
    val pairs = for {
      i <- masters.indices; j <- masters.indices
      if Bench.coresOf(masters(j)) > Bench.coresOf(masters(i))
    } yield {
      val ratio = Bench.coresOf(masters(j)).toDouble / Bench.coresOf(masters(i))
      val eff = tp(j) / (ratio * tp(i))
      val effBest = (nPages / best(j)) / (ratio * (nPages / best(i)))
      val ceiling = ceil(i) / (ratio * ceil(j))
      (s"${masters(i)}->${masters(j)}", eff, effBest, ceiling, eff / ceiling)
    }

    val shapesJson = masters.indices.map { i =>
      val rs = runs(i).map(r => f"$r%.2f").mkString("[", ",", "]")
      def arr(f2: Run => Double) =
        fullRuns(i).map(r => f"${f2(r)}%.1f").mkString("[", ",", "]")
      f"""{"master":"${masters(i)}","cores":${Bench.coresOf(masters(i))},""" +
        f""""runs":$rs,"median_sec":${med(i)}%.2f,"best_sec":${best(i)}%.2f,""" +
        f""""docs_per_sec":${tp(i)}%.1f,"cpu_ceiling_sec":${ceil(i)}%.2f,""" +
        f""""task_cpu_sec_per_run":${arr(_.taskCpuSec)},""" +
        f""""gc_sec_per_run":${arr(_.gcSec)},""" +
        f""""other_proc_cpu_sec_per_run":${arr(_.otherProcCpuSec)}}"""
    }.mkString("[", ",", "]")
    val pairsJson = pairs.map { case (k, eff, effBest, ceiling, norm) =>
      f""""$k":{"scaling_efficiency":$eff%.3f,"scaling_efficiency_best":$effBest%.3f,""" +
        f""""hw_scaling_ceiling":$ceiling%.3f,"normalized_efficiency":$norm%.3f}"""
    }.mkString("{", ",", "}")
    println(s"""{"job":"$job","pages":$nPages,"shapes":$shapesJson,"pairs":$pairsJson}""")
    Bench.deleteTree(tmp, "scaling")
  }
}
