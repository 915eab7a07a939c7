package graft

import java.nio.file.Files

/** Scaling-efficiency evidence for the north_rule's two-cluster-size
  * criterion, mapped in-sandbox to two parallelism levels (driver
  * instruction): the identical dedup job on the IDENTICAL materialized
  * input at local[8] and local[32] (shuffle partitions matched to cores);
  * efficiency = throughput(32) / (4 × throughput(8)). The corpus is
  * generated and written to parquet ONCE, outside both measurements.
  * Prints one JSON line; numbers are recorded in BASELINE.md.
  */
object ScalingBench {

  /** Hardware parallel-scaling ceiling: an embarrassingly-parallel,
    * shuffle-free CPU-bound Spark job (chained sha2 over a range) at the
    * same two parallelism levels. On this sandbox VM, all-core clocks are
    * lower than few-core clocks (frequency scaling), so even perfect code
    * cannot reach efficiency 1.0 between local[8] and local[32] — this
    * measures what "perfect" actually is here, and the pipeline's
    * normalized efficiency is reported against it. (On a real multi-
    * executor cluster — the north_rule's setting — the two sizes run on
    * disjoint machines and this coupling disappears.)
    */
  def cpuCeilingSecs(cpus: String, rows: Long): Double = {
    val spark = Bench.sessionFor(cpus)
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
    // round-4 diagnosis (BASELINE.md): a large Xmx lets G1 ergonomics
    // expand the heap instead of collecting, and the dispersed heap
    // inflates task CPU up to 2.25× via memory stalls — the measured cause
    // of the 660k/local[32] run-time bimodality. Scaling numbers are only
    // comparable in the dense-heap regime.
    if (Runtime.getRuntime.maxMemory > 20L * 1024 * 1024 * 1024)
      System.err.println(
        "[scaling] WARNING: Xmx > 20g puts G1 in the heap-expansion regime " +
          "(BASELINE.md round 4: memory-stall CPU inflation, bimodal runs); " +
          "set SPARK_DRIVER_MEM=16g for comparable measurements")
    val numBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "20000").toLong
    val ceilRows = sys.env.getOrElse("SPARK_GRAFT_CEIL_ROWS", "40000000").toLong
    val nPages = numBase * graft.pages.PagesGen.variantKinds.length

    val tmp = Files.createTempDirectory("graft-scale").toString
    val gen = Bench.sessionFor("32")
    val warmPath = Bench.materializePages(gen, math.max(50L, numBase / 20), s"$tmp/warm")
    val fullPath = Bench.materializePages(gen, numBase, s"$tmp/full")
    gen.stop()

    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt

    // one timed run in a fresh session (fresh JIT state is equalized by a
    // 1/20-size warmup run first)
    def timeOne(cpus: String, i: Int): Double = {
      val spark = Bench.sessionFor(cpus)
      Bench.runPipelineOn(spark, warmPath)
      Bench.dropPipelineState(spark)
      val t0 = System.nanoTime()
      Bench.runPipelineOn(spark, fullPath)
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      System.err.println(f"[scaling] local[$cpus] run $i: $sec%.2f s")
      sec
    }

    // INTERLEAVED medians: the sandbox VM's throughput drifts minute-to-
    // minute (shared tenancy), so running all 8-thread reps then all
    // 32-thread reps would let the drift masquerade as a scaling effect.
    // Alternating 8/32 pairs puts both levels in the same minutes; medians
    // of N then cancel symmetric noise.
    val runs = (1 to reps).map(i => (timeOne("8", i), timeOne("32", i)))
    def medianOf(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val s8 = medianOf(runs.map(_._1))
    val s32 = medianOf(runs.map(_._2))
    // co-tenant interference is strictly ADDITIVE, so the min over reps
    // estimates the uncontended capability of each level — reported
    // alongside the medians, never in place of them
    val b8 = runs.map(_._1).min
    val b32 = runs.map(_._2).min
    val tp8 = nPages / s8
    val tp32 = nPages / s32
    val eff = tp32 / (4.0 * tp8)

    val c8 = cpuCeilingSecs("8", ceilRows)
    val c32 = cpuCeilingSecs("32", ceilRows)
    val ceiling = c8 / (4.0 * c32) // throughput ratio of the perfect job
    val normalized = eff / ceiling

    val r8 = runs.map(r => f"${r._1}%.2f").mkString("[", ",", "]")
    val r32 = runs.map(r => f"${r._2}%.2f").mkString("[", ",", "]")
    val effBest = b8 / (4.0 * b32)
    println(f"""{"pages":$nPages,"sec_local8":$s8%.2f,"sec_local32":$s32%.2f,""" +
      f""""runs_local8":$r8,"runs_local32":$r32,""" +
      f""""docs_per_sec_local8":$tp8%.1f,"docs_per_sec_local32":$tp32%.1f,""" +
      f""""scaling_efficiency_8_to_32":$eff%.3f,""" +
      f""""best_sec_local8":$b8%.2f,"best_sec_local32":$b32%.2f,""" +
      f""""scaling_efficiency_best":$effBest%.3f,""" +
      f""""cpu_ceiling_sec8":$c8%.2f,"cpu_ceiling_sec32":$c32%.2f,""" +
      f""""hw_scaling_ceiling":$ceiling%.3f,"normalized_efficiency":$normalized%.3f}""")
  }
}
