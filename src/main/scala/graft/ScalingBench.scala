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
    val numBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "20000").toLong
    val ceilRows = sys.env.getOrElse("SPARK_GRAFT_CEIL_ROWS", "40000000").toLong
    val nPages = numBase * graft.pages.PagesGen.variantKinds.length

    val tmp = Files.createTempDirectory("graft-scale").toString
    val gen = Bench.sessionFor("32")
    val warmPath = Bench.materializePages(gen, math.max(50L, numBase / 20), s"$tmp/warm")
    val fullPath = Bench.materializePages(gen, numBase, s"$tmp/full")
    gen.stop()

    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt

    // median of N runs per level: the sandbox VM's throughput varies
    // minute-to-minute (shared tenancy), so single-shot times are unusable
    def measure(cpus: String): Double = {
      val spark = Bench.sessionFor(cpus)
      Bench.runPipelineOn(spark, warmPath) // warmup JIT/codegen
      Bench.dropPipelineState(spark)
      val secs = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        Bench.runPipelineOn(spark, fullPath)
        val sec = (System.nanoTime() - t0) / 1e9
        Bench.dropPipelineState(spark)
        System.err.println(f"[scaling] local[$cpus] run $i: $sec%.2f s")
        sec
      }.sorted
      spark.stop()
      secs(secs.length / 2)
    }

    val s8 = measure("8")
    val s32 = measure("32")
    val tp8 = nPages / s8
    val tp32 = nPages / s32
    val eff = tp32 / (4.0 * tp8)

    val c8 = cpuCeilingSecs("8", ceilRows)
    val c32 = cpuCeilingSecs("32", ceilRows)
    val ceiling = c8 / (4.0 * c32) // throughput ratio of the perfect job
    val normalized = eff / ceiling

    println(f"""{"pages":$nPages,"sec_local8":$s8%.2f,"sec_local32":$s32%.2f,""" +
      f""""docs_per_sec_local8":$tp8%.1f,"docs_per_sec_local32":$tp32%.1f,""" +
      f""""scaling_efficiency_8_to_32":$eff%.3f,""" +
      f""""cpu_ceiling_sec8":$c8%.2f,"cpu_ceiling_sec32":$c32%.2f,""" +
      f""""hw_scaling_ceiling":$ceiling%.3f,"normalized_efficiency":$normalized%.3f}""")
  }
}
