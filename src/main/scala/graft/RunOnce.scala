package graft

import java.nio.file.Files

/** One-shot pipeline run in a fresh JVM/session — timing bisect tool.
  * SPARK_GRAFT_STAGE=map runs ONLY the shuffle-free map prefix (scan →
  * extract → fused fingerprint → agg), isolating the embarrassingly-
  * parallel stage's scaling from the pair/cluster shuffles.
  */
object RunOnce {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val numBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "20000").toLong
    val warm = sys.env.contains("SPARK_GRAFT_WARMUP")
    val mapOnly = sys.env.get("SPARK_GRAFT_STAGE").contains("map")
    val spark = Bench.sessionFor(cpus)
    val tmp = Files.createTempDirectory("graft-once").toString
    if (sys.env.contains("SPARK_GRAFT_SKEW"))
      graft.pages.PagesGen.skewPages(spark, numBase, seed = 42L, tokensPerDoc = 200)
        .toDF().write.mode("overwrite").parquet(s"$tmp/full")
    else Bench.materializePages(spark, numBase, s"$tmp/full")

    def job(path: String): Long =
      if (sys.env.get("SPARK_GRAFT_STAGE").contains("shuffle")) {
        // pure shuffle ceiling: synthetic wide groupBy (no engine code) —
        // measures what ANY shuffle-bound Spark job can scale to on this
        // box, the shuffle-stage analog of the chained-sha2 CPU ceiling.
        // The synthetic job has no corpus: a warm call (path under /warm)
        // runs a 1/20-size shuffle, not a second full-size one.
        import org.apache.spark.sql.functions._
        val rows = if (path.endsWith("/warm")) numBase * 30 else numBase * 600
        spark.range(rows)
          .select(pmod(xxhash64(col("id")), lit(rows / 10)).as("k"))
          .groupBy("k").count()
          .agg(sum("count")).collect()(0).getLong(0)
      } else if (mapOnly) {
        import org.apache.spark.sql.functions._
        val pages = spark.read.parquet(path).select(col("url"),
          graft.fingerprint.Fingerprints.extractText(col("html")).as("text"))
        // collect the checksum row (count() would let Catalyst elide the
        // aggregate inputs entirely and skip the map work)
        graft.pipeline.DedupPipeline
          .signatures(pages, "url", "text", graft.pipeline.DedupConfig())
          .agg(expr("bit_xor(simhash)").as("x"), sum("n_shingles").as("s"))
          .collect()(0).getLong(1)
      } else {
        // bisect knobs: raise the containment gate past 1.0 to disable the
        // suffix-array slice, tighten the Hamming prefilter, etc.
        val cfg = graft.pipeline.DedupConfig(
          containmentGate = sys.env.get("SPARK_GRAFT_CGATE").map(_.toDouble)
            .getOrElse(graft.pipeline.DedupConfig().containmentGate),
          simhashMaxHamming = sys.env.get("SPARK_GRAFT_MAXHAM").map(_.toInt)
            .getOrElse(graft.pipeline.DedupConfig().simhashMaxHamming))
        Bench.runPipelineOn(spark, path, cfg)
      }

    if (warm) {
      // the synthetic shuffle mode reads no corpus — don't materialize one
      if (!sys.env.get("SPARK_GRAFT_STAGE").contains("shuffle"))
        Bench.materializePages(spark, math.max(50L, numBase / 20), s"$tmp/warm")
      job(s"$tmp/warm")
      Bench.dropPipelineState(spark)
      System.err.println("[once] warmup done")
    }
    // interleaved same-JVM A/B of the minhash-estimate verify tier: the
    // box's 2-3× co-tenant noise makes cross-invocation comparisons
    // meaningless — alternate the toggle within one session and take
    // per-arm medians
    if (sys.env.contains("SPARK_GRAFT_AB")) {
      // the flag doubles as rep count when numeric; SPARK_GRAFT_AB=true /
      // empty means "on, default reps" rather than a NumberFormatException
      // after the corpus already materialized
      val reps = sys.env.get("SPARK_GRAFT_AB").flatMap(_.toIntOption)
        .filter(_ > 0).getOrElse(3)
      def one(est: Boolean): Double = {
        Bench.dropPipelineState(spark)
        val t0 = System.nanoTime()
        Bench.runPipelineOn(spark, s"$tmp/full",
          graft.pipeline.DedupConfig(estimateTier = est))
        (System.nanoTime() - t0) / 1e9
      }
      one(false) // JIT both code paths once
      one(true)
      val runs = (1 to reps).map(i => (one(false), one(true)))
      def med(xs: Seq[Double]) = Bench.median(xs)
      println(f"""{"ab":"estimateTier","off_med":${med(runs.map(_._1))}%.2f,""" +
        f""""on_med":${med(runs.map(_._2))}%.2f,""" +
        f""""off":[${runs.map(r => f"${r._1}%.1f").mkString(",")}],""" +
        f""""on":[${runs.map(r => f"${r._2}%.1f").mkString(",")}]}""")
      spark.stop()
      return
    }
    // count Spark jobs issued by the timed run: every job is a blocking
    // driver round-trip (plan + schedule + barrier), the fixed-overhead
    // component of the scaling story
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobLog = sys.env.contains("SPARK_GRAFT_JOBLOG")
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (jobLog) {
          // attribute each driver round-trip: callsite + triggering action
          val sites = js.stageInfos.map(_.name)
            .filterNot(_.contains("CompletableFuture")).distinct
          val site = sites.headOption.getOrElse(
            js.stageInfos.headOption.map(_.name).getOrElse("?"))
          val exec = Option(js.properties).flatMap(x =>
            Option(x.getProperty("spark.sql.execution.id"))).getOrElse("-")
          val rddName = js.stageInfos.lastOption
            .flatMap(_.rddInfos.lastOption).map(_.name).getOrElse("?")
          System.err.println(
            s"[joblog] job=${js.jobId} exec=$exec stages=${js.stageInfos.size} " +
              s"rdd=$rddName site=$site")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    if (jobLog) spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit =
          System.err.println(f"[execlog] exec=${qe.id} func=$funcName " +
            f"${durationNs / 1e9}%.2fs root=${qe.executedPlan.nodeName}")
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               e: Exception): Unit = ()
      })
    val t0 = System.nanoTime()
    val n = job(s"$tmp/full")
    val sec = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    val stage = sys.env.getOrElse("SPARK_GRAFT_STAGE", "full")
    println(f"""{"cpus":$cpus,"stage":"$stage","rows":$n,"sec":$sec%.2f,""" +
      f""""spark_jobs":${jobs.get()}}""")
    spark.stop()
  }
}
