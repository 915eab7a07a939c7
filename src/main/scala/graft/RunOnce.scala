package graft

import java.nio.file.Files

/** One-shot pipeline run in a fresh JVM/session — timing bisect tool. */
object RunOnce {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val numBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "20000").toLong
    val warm = sys.env.contains("SPARK_GRAFT_WARMUP")
    val spark = Bench.sessionFor(cpus)
    val tmp = Files.createTempDirectory("graft-once").toString
    Bench.materializePages(spark, numBase, s"$tmp/full")
    if (warm) {
      Bench.materializePages(spark, math.max(50L, numBase / 20), s"$tmp/warm")
      Bench.runPipelineOn(spark, s"$tmp/warm")
      Bench.dropPipelineState(spark)
      System.err.println("[once] warmup done")
    }
    val t0 = System.nanoTime()
    val n = Bench.runPipelineOn(spark, s"$tmp/full")
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"cpus":$cpus,"rows":$n,"sec":$sec%.2f}""")
    spark.stop()
  }
}
