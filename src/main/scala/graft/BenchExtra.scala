package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.pipeline.{DedupConfig, DedupPipeline}

/** Round-6 optimization harness (guide §1.4): NOT part of the frozen driver
  * contract — a separate main for noop-sink isolation, GRAFT_TIMING stage
  * attribution and per-query explain dumps, so optimization work never has
  * to touch `Bench.scala`.
  *
  * Modes (SPARK_GRAFT_EXTRA):
  *  - `pipeline` (default): warmup + N reps of the e2e pipeline over the
  *    bench-tier corpus with GRAFT_TIMING stage ticks visible.
  *  - `queries`: each headline query timed cold + warm in one session —
  *    isolates cold-session cost (codegen/JIT) from steady-state cost.
  *    Sink matches Bench (`count()`) for comparability by default;
  *    SPARK_GRAFT_EXTRA_NOOP=1 switches to the noop sink (guide §1.4:
  *    computes every column, no count() pruning).
  *  - `explain <name>`: print `.explain("formatted")` of one query.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mode = sys.env.getOrElse("SPARK_GRAFT_EXTRA",
      args.headOption.getOrElse("pipeline"))
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = Bench.sessionFor(cpus)

    val useNoop = sys.env.contains("SPARK_GRAFT_EXTRA_NOOP")
    def noop(df: DataFrame): Unit =
      if (useNoop) df.write.format("noop").mode("overwrite").save()
      else df.count(): Unit

    def timed(name: String)(f: => Unit): Double = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      println(f"[extra] $name%-34s $sec%8.2f s")
      sec
    }

    mode match {
      case "explain" =>
        val name = args(1)
        println(SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))

      case "jobs" =>
        // per-job attribution (guide §7.1 stand-in — spark.ui is off in the
        // bench session): run one query warm, listing every Spark job with
        // its wall duration and description, so serialized driver/AQE job
        // floors are visible and countable
        val name = args(1)
        import scala.collection.mutable
        val jobs = mutable.Map[Int, (Long, String)]()
        val done = mutable.ArrayBuffer[(Int, Double, String)]()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.synchronized {
              jobs(js.jobId) = (System.nanoTime(),
                Option(js.properties.getProperty("spark.job.description"))
                  .getOrElse(""))
            }
          override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            jobs.synchronized {
              jobs.remove(je.jobId).foreach { case (t0, d) =>
                done += ((je.jobId, (System.nanoTime() - t0) / 1e9, d))
              }
            }
        }
        noop(SparkEntry.queries(name)(spark, sfDir)) // warm first
        Bench.dropPipelineState(spark)
        spark.sparkContext.addSparkListener(listener)
        val warmSec = timed(s"$name warm") { noop(SparkEntry.queries(name)(spark, sfDir)) }
        Thread.sleep(500) // let the async listener bus drain
        spark.sparkContext.removeSparkListener(listener)
        val all = done.sortBy(_._1)
        println(f"[jobs] $name: ${all.size} jobs, sum ${all.map(_._2).sum}%.2f s, wall $warmSec%.2f s")
        all.foreach { case (id, sec, d) =>
          println(f"[jobs]   #$id%-4d $sec%6.2f s  ${d.take(100)}") }

      case "queries" =>
        val names = if (args.length > 1) args.drop(1).toSeq
          else Seq("q_dedup_clusters", "q_minhash_lsh_pairs", "q_exact_dedup",
            "q1_agg", "q_embedding_knn", "q_ngram_jaccard", "q_events_hourly",
            "q_token_count", "q_window_top1", "q_para_dedup", "q_url_canon",
            "q_semdedup")
        val rows = names.map { n =>
          val cold = timed(s"$n cold") { noop(SparkEntry.queries(n)(spark, sfDir)) }
          val warm = timed(s"$n warm") { noop(SparkEntry.queries(n)(spark, sfDir)) }
          (n, cold, warm)
        }
        println(rows.map { case (n, c, w) =>
          s""""$n":[${f"$c%.2f"},${f"$w%.2f"}]""" }
          .mkString("""{"extra":"queries","cold_warm":{""", ",", "}}"))

      case "battery" =>
        // per-stage isolation of Bench's clean_battery line (guide §1.4):
        // same corpus derivation and composition as Bench.runBatteryOn, but
        // each stage is additionally timed alone against a materialized
        // input so the composed 8-second line attributes to its stages
        val numBase = Bench.numBaseFor(sfDir)
        val tmp = Files.createTempDirectory("graft-extra-bat").toString
        val fullPath = Bench.materializePages(spark, numBase, s"$tmp/full")
        val batteryPath = Bench.materializeBattery(spark, fullPath, s"$tmp/battery")
        val mat = graft.state.Materializer.local
        import org.apache.spark.sql.functions.col
        // composed line exactly as Bench times it (warm + reps)
        Bench.runBatteryOn(spark, batteryPath) // warm
        val composed = (1 to reps).map { i =>
          Bench.dropPipelineState(spark)
          timed(s"battery composed rep $i") { Bench.runBatteryOn(spark, batteryPath) }
        }
        // stage isolation: each stage computed from a checkpointed input so
        // the timing is the stage, not its upstream lineage
        def stageIn(df: DataFrame): DataFrame = {
          val m = mat(df); m.count()
          println(s"[extra]   stage input partitions: ${m.rdd.getNumPartitions}")
          m
        }
        Bench.dropPipelineState(spark)
        val raw = spark.read.parquet(batteryPath)
        val s0 = stageIn(raw)
        val cap = timed("stage site_cap") {
          noop(graft.text.SiteQuota.capPerSite(s0, "url", cap = 1000000)) }
        val s1 = stageIn(graft.text.SiteQuota.capPerSite(s0, "url", cap = 1000000))
        val c4t = timed("stage c4_clean") {
          noop(graft.text.C4Clean.clean(s1, "text")
            .filter(col("kept")).select(col("url"), col("text"))) }
        val s2 = stageIn(graft.text.C4Clean.clean(s1, "text")
          .filter(col("kept")).select(col("url"), col("text")))
        if (sys.env.contains("SPARK_GRAFT_EXTRA_EXPLAIN"))
          println(graft.text.Repetition.filterGopher(s2, "text")
            .select(col("url"), col("text"))
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        val gopht = timed("stage gopher") {
          noop(graft.text.Repetition.filterGopher(s2, "text")
            .select(col("url"), col("text"))) }
        val s3 = stageIn(graft.text.Repetition.filterGopher(s2, "text")
          .select(col("url"), col("text")))
        val parat = timed("stage para_dedup") {
          noop(graft.text.ParagraphDedup.dedupParagraphs(s3, "url", "text")
            .select(col("url"), col("text"))) }
        val s4 = stageIn(graft.text.ParagraphDedup.dedupParagraphs(s3, "url", "text")
          .select(col("url"), col("text")))
        val spant = timed("stage span_dedup") {
          noop(graft.text.SpanDedup.dedupSpans(s4, "url", "text")) }
        println(s"""{"extra":"battery","composed":[${
          composed.map(r => f"$r%.2f").mkString(",")}],"median":${
          f"${Bench.median(composed)}%.2f"},"stages":{"site_cap":${f"$cap%.2f"},""" +
          s""""c4_clean":${f"$c4t%.2f"},"gopher":${f"$gopht%.2f"},""" +
          s""""para_dedup":${f"$parat%.2f"},"span_dedup":${f"$spant%.2f"}}}""")
        Bench.deleteTree(tmp, "bench-extra")

      case "lines" =>
        // replicates Bench's warc_ingest / mix_export / pack_plan protocol
        // (same untimed setup, same timed job, same reps) for fast iteration
        val numBase = Bench.numBaseFor(sfDir)
        val nPages = numBase * graft.pages.PagesGen.variantKinds.length
        val tmp = Files.createTempDirectory("graft-extra-ln").toString
        val fullPath = Bench.materializePages(spark, numBase, s"$tmp/full")
        import org.apache.spark.sql.functions.{col, length}
        val warcDir = s"$tmp/warc"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(warcDir))
        spark.read.parquet(fullPath).select("url", "warc_ts", "html")
          .repartition(32).foreachPartition {
            (it: Iterator[org.apache.spark.sql.Row]) =>
            if (it.hasNext) {
              val pid = org.apache.spark.TaskContext.getPartitionId()
              val f = new java.io.FileOutputStream(f"$warcDir/part-$pid%03d.warc.gz")
              try it.foreach { r =>
                graft.sources.warc.Warc.writeGzipMember(f,
                  graft.sources.warc.Warc.encodeRecord("response",
                    r.getString(0), r.getTimestamp(1).toInstant,
                    "application/http; msgtype=response",
                    graft.sources.warc.Warc.httpResponseBlock(r.getAs[Array[Byte]](2))))
              } finally f.close()
            }
          }
        def rep(name: String)(f: => Unit): Seq[Double] =
          (1 to reps).map { i =>
            Bench.dropPipelineState(spark)
            timed(s"$name rep $i")(f)
          }
        val warcRuns = rep("warc_ingest") {
          val n = graft.sources.warc.WarcIO.pages(spark, warcDir)
            .select(graft.fingerprint.Fingerprints.extractText(col("html")).as("text"))
            .filter(length(col("text")) >= 0).count()
          require(n == nPages, s"warc_ingest read $n of $nPages records")
        }
        val mixRuns = rep("mix_export") {
          val corpus = spark.read.parquet(fullPath).select(
            col("url"), col("lang"), col("text"))
          val (mixed, _) = graft.mix.CorpusMix.mixByTokenBudget(
            corpus, "url", "text", "lang",
            Map("en" -> nPages * 25L, "de" -> Long.MaxValue / 4,
              "fr" -> Long.MaxValue / 4, "es" -> Long.MaxValue / 4), "bench-mix")
          val stats = graft.mix.ShardedExport.exportShards(
            spark, mixed, "url", "text", s"$tmp/export", nShards = 32)
          require(stats.map(_.docs).sum > 0, "mix_export wrote an empty corpus")
        }
        locally {
          val corpus = spark.read.parquet(fullPath).select(
            col("url"), col("lang"), col("text"))
          graft.mix.ShardedExport.exportShards(spark, corpus, "url", "text",
            s"$tmp/export_packed", nShards = 32, packOrder = true)
        }
        val packRuns = rep("pack_plan") {
          val (examples, rows) = graft.mix.SequencePack.writePlan(
            spark, s"$tmp/export_packed", "url", seqLen = 2048, nShards = 32)
          require(examples > 0 && rows >= examples, "pack_plan planned nothing")
        }
        def arr(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
        println(s"""{"extra":"lines","warc_ingest":${arr(warcRuns)},""" +
          s""""mix_export":${arr(mixRuns)},"pack_plan":${arr(packRuns)}}""")
        Bench.deleteTree(tmp, "bench-extra")

      case "skew" =>
        // replicates Bench's dedup_pipeline_skew protocol (same skewPages
        // corpus, same listener, same per-rep attribution columns)
        val numBase = Bench.numBaseFor(sfDir)
        val tmp = Files.createTempDirectory("graft-extra-sk").toString
        val warmPath = Bench.materializePages(spark, math.max(50L, numBase / 20),
          s"$tmp/warm")
        val skewPath = s"$tmp/skew"
        graft.pages.PagesGen.skewPages(spark, numBase, seed = 42L, tokensPerDoc = 200)
          .toDF().write.mode("overwrite").parquet(skewPath)
        Bench.runPipelineOn(spark, warmPath)
        val runs = (1 to reps).map { i =>
          Bench.dropPipelineState(spark)
          var maxRec = 0L; var cpuS = 0.0
          val sec = timed(s"skew rep $i") {
            val (_, l) = TaskSkewListener.measure(spark) {
              Bench.runPipelineOn(spark, skewPath)
            }
            maxRec = l.maxShuffleReadRecords.get()
            cpuS = l.totalTaskCpuNs.get() / 1e9
          }
          println(f"[extra]   max task shuffle records $maxRec, task cpu $cpuS%.0f s")
          sec
        }
        println(s"""{"extra":"skew","runs":[${
          runs.map(r => f"$r%.2f").mkString(",")}],"median":${
          f"${Bench.median(runs)}%.2f"}}""")
        Bench.deleteTree(tmp, "bench-extra")

      case "epochs" =>
        // replicates Bench's cluster_epoch_{full,delta,slice} protocol
        // (same corpus tier, same +10% batch, same state-copy-per-rep)
        // so epoch-path optimizations are measurable without the frozen
        // 16-minute Bench run
        val numBase = Bench.numBaseFor(sfDir)
        val tmp = Files.createTempDirectory("graft-extra-ep").toString
        val warmPath = Bench.materializePages(spark, math.max(50L, numBase / 20),
          s"$tmp/warm")
        val fullPath = Bench.materializePages(spark, numBase, s"$tmp/full")
        val resumeBatch = Bench.materializePages(spark, numBase * 11 / 10,
          s"$tmp/resume_batch")
        val slicePath = s"$tmp/resume_slice"
        spark.read.parquet(resumeBatch)
          .join(spark.read.parquet(fullPath).select("url"), Seq("url"), "left_anti")
          .write.mode("overwrite").parquet(slicePath)
        Bench.runPipelineOn(spark, warmPath)
        def pf(p: String) = Bench.pagesFrame(spark, p)
        val clusterBase = java.nio.file.Paths.get(tmp, "st_cluster")
        graft.state.Checkpoints.clusterEpoch(spark, pf(fullPath),
          "url", "text", clusterBase.toString, DedupConfig(deltaCluster = true))
        val lines = Seq(
          ("cluster_epoch_full", DedupConfig(), resumeBatch, None),
          ("cluster_epoch_delta", DedupConfig(deltaCluster = true), resumeBatch, None),
          ("cluster_epoch_slice", DedupConfig(deltaCluster = true), slicePath,
            Some(resumeBatch)))
        val out = lines.map { case (name, cfg, inPath, textsPath) =>
          val runs = (1 to reps).map { rep =>
            Bench.dropPipelineState(spark)
            val dir = java.nio.file.Paths.get(tmp, s"st_${name}_r$rep")
            Bench.copyDir(clusterBase, dir)
            timed(s"$name rep $rep") {
              graft.state.Checkpoints.clusterEpoch(
                spark, pf(inPath), "url", "text", dir.toString, cfg,
                textsOf = textsPath.map(pf))
            }
          }
          name -> Bench.median(runs)
        }
        println(out.map { case (n, s) => s""""$n":${f"$s%.2f"}""" }
          .mkString("""{"extra":"epochs",""", ",", "}"))
        Bench.deleteTree(tmp, "bench-extra")

      case _ => // pipeline
        val numBase = Bench.numBaseFor(sfDir)
        val tmp = Files.createTempDirectory("graft-extra").toString
        val warmPath = Bench.materializePages(spark, math.max(50L, numBase / 20),
          s"$tmp/warm")
        val fullPath = Bench.materializePages(spark, numBase, s"$tmp/full")
        Bench.runPipelineOn(spark, warmPath)
        val cfg =
          if (sys.env.contains("SPARK_GRAFT_EXTRA_FAST")) DedupConfig(fastPath = true)
          else if (sys.env.contains("SPARK_GRAFT_EXTRA_RELIABLE"))
            DedupConfig(reliableCheckpoints = true, checkpointDir = s"$tmp/ckpt")
          else DedupConfig()
        val runs = (1 to reps).map { i =>
          Bench.dropPipelineState(spark)
          timed(s"pipeline rep $i") { Bench.runPipelineOn(spark, fullPath, cfg) }
        }
        println(s"""{"extra":"pipeline","runs":[${
          runs.map(r => f"$r%.2f").mkString(",")}],"median":${
          f"${Bench.median(runs)}%.2f"}}""")
        Bench.deleteTree(tmp, "bench-extra")
    }
    spark.stop()
  }
}
