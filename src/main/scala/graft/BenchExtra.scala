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
