package graft

/** Scaling-efficiency evidence for the north_rule's two-cluster-size
  * criterion, mapped in-sandbox to two parallelism levels (driver
  * instruction): the identical dedup job on the identical input at
  * local[8] and local[32] (shuffle partitions matched to cores);
  * efficiency = throughput(32) / (4 × throughput(8)). Prints one JSON
  * line; numbers are recorded in BASELINE.md.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val numBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "4000").toLong
    val nPages = numBase * graft.pages.PagesGen.variantKinds.length

    def measure(cpus: String): Double = {
      val spark = Bench.sessionFor(cpus)
      Bench.runPipeline(spark, math.max(50L, numBase / 20)) // warmup JIT/codegen
      val t0 = System.nanoTime()
      Bench.runPipeline(spark, numBase)
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      sec
    }

    val s8 = measure("8")
    val s32 = measure("32")
    val tp8 = nPages / s8
    val tp32 = nPages / s32
    val eff = tp32 / (4.0 * tp8)
    println(f"""{"pages":$nPages,"sec_local8":$s8%.2f,"sec_local32":$s32%.2f,""" +
      f""""docs_per_sec_local8":$tp8%.1f,"docs_per_sec_local32":$tp32%.1f,""" +
      f""""scaling_efficiency_8_to_32":$eff%.3f}""")
  }
}
