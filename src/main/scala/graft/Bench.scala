package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.pages.PagesGen
import graft.pipeline.{DedupConfig, DedupPipeline}

/** Per-round benchmark: headline queries on SPARK_GRAFT_SF_DIR plus the
  * end-to-end dedup pipeline over the deterministic synthetic pages corpus
  * (sized by the SF tier). Prints ONE JSON line.
  *
  * The pages corpus is MATERIALIZED to parquet outside the timed region —
  * the engine's contract is "read the Iceberg pages table" (north_star), so
  * dedup throughput measures scan→fingerprint→LSH→verify→cluster, not the
  * synthetic generator.
  */
object Bench {

  def sessionFor(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** numBase docs for the generated-pages pipeline, scaled by the SF dir
    * name (sf0.001 → 40 base; sf0.1 → 4,000 base = 40k pages).
    */
  def numBaseFor(sfDir: String): Long = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.01)
    math.max(100L, (sf * 40000).toLong)
  }

  /** Write the deterministic corpus as a parquet pages table (untimed). */
  def materializePages(spark: SparkSession, numBase: Long, dir: String): String = {
    PagesGen.pages(spark, numBase, seed = 42L, tokensPerDoc = 200).toDF()
      .write.mode("overwrite").parquet(dir)
    dir
  }

  /** The timed job: read the pages table, dedup, count clusters. */
  def runPipelineOn(spark: SparkSession, path: String): Long =
    DedupPipeline.run(spark, spark.read.parquet(path), "url", "text", DedupConfig()).count()

  /** Drop every persisted/checkpointed RDD left by a pipeline run.
    * localCheckpoint blocks are normally reclaimed asynchronously by the
    * ContextCleaner only after driver GC — in a long-lived session that
    * backlog measurably degrades subsequent runs, so benchmarks flush it
    * deterministically between runs.
    */
  def dropPipelineState(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = sessionFor(cpus)

    val headline = Seq("q_dedup_clusters", "q_minhash_lsh_pairs", "q_exact_dedup",
      "q1_agg", "q_embedding_knn", "q_ngram_jaccard", "q_events_hourly",
      "q_token_count", "q_window_top1")

    val results = headline.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // end-to-end dedup throughput over the materialized pages corpus
    val numBase = numBaseFor(sfDir)
    val nPages = numBase * PagesGen.variantKinds.length
    val tmp = Files.createTempDirectory("graft-bench").toString
    val warmPath = materializePages(spark, math.max(50L, numBase / 20), s"$tmp/warm")
    val fullPath = materializePages(spark, numBase, s"$tmp/full")
    runPipelineOn(spark, warmPath) // warmup (JIT + codegen)
    dropPipelineState(spark)
    val t0 = System.nanoTime()
    runPipelineOn(spark, fullPath)
    val pipeSec = (System.nanoTime() - t0) / 1e9
    val docsPerSec = nPages / pipeSec

    val all = results :+ ("dedup_pipeline_e2e" -> pipeSec)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = f"${all.map(_._2).sum}%.3f"
    val dps = f"$docsPerSec%.1f"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","pipeline_pages":$nPages,"pipeline_docs_per_sec":$dps}""")
    spark.stop()
  }
}
