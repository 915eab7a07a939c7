package graft

import org.apache.spark.sql.SparkSession

import graft.pages.PagesGen
import graft.pipeline.{DedupConfig, DedupPipeline}

/** Per-round benchmark: headline queries on SPARK_GRAFT_SF_DIR plus the
  * end-to-end dedup pipeline over the deterministic synthetic pages corpus
  * (sized by the SF tier). Prints ONE JSON line.
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
    * name (sf0.001 → 400 base = 3.6k pages; sf0.1 → 4,000 base = 36k pages).
    */
  def numBaseFor(sfDir: String): Long = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.01)
    math.max(100L, (sf * 40000).toLong)
  }

  def runPipeline(spark: SparkSession, numBase: Long): Long = {
    val pages = PagesGen.pages(spark, numBase, seed = 42L, tokensPerDoc = 200).toDF()
    DedupPipeline.run(spark, pages, "url", "text", DedupConfig()).count()
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

    // end-to-end dedup throughput over the synthetic pages corpus
    val numBase = numBaseFor(sfDir)
    val nPages = numBase * PagesGen.variantKinds.length
    runPipeline(spark, math.max(50L, numBase / 20)) // warmup (JIT + codegen)
    val t0 = System.nanoTime()
    runPipeline(spark, numBase)
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
