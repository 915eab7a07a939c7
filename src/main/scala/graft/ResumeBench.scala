package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, xxhash64}

import graft.pipeline.DedupConfig
import graft.state.Checkpoints

/** Measures the resume primitive (J1) — `new batch LEFT ANTI persisted
  * state` — at the AT-SCALE join shape, plain vs bucketed state layout
  * (DedupConfig.stateBuckets), on the standard scaling corpus tier.
  *
  * Broadcast is disabled throughout: at the 10^12-doc posture the state
  * can never broadcast, so the regime that matters is the sort-merge one.
  * Two timed surfaces per layout, medians of `SPARK_GRAFT_BENCH_REPS`:
  *
  *  - `discover`: the pure read-only anti-join (scan batch → extract →
  *    anti-join state → count). Apples-to-apples: both layouts pay the
  *    identical batch-side work; the delta is the state-side exchange the
  *    bucketed layout removes. Shuffle write/read byte totals from the
  *    task listener are reported per rep as the direct ledger evidence.
  *  - `epoch`: the full runEpoch (anti-join + fingerprint the 10% new +
  *    bucketed/plain append + lineage) on a fresh COPY of the state dir
  *    per rep, so each rep discovers the same new pages.
  *
  * Env: SPARK_GRAFT_RESUME_BASE (default 60000 bases ⇒ 660k-page state),
  * SPARK_GRAFT_MASTER (default local[32]), SPARK_GRAFT_BENCH_REPS (3).
  * Prints ONE JSON line.
  */
object ResumeBench {

  def main(args: Array[String]): Unit = {
    val numBase = sys.env.getOrElse("SPARK_GRAFT_RESUME_BASE", "60000").toLong
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = Bench.sessionForMaster(master)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val tmp = Files.createTempDirectory("graft-resume").toString
    val fullPath = Bench.materializePages(spark, numBase, s"$tmp/full")
    val batchPath = Bench.materializePages(spark, numBase * 11 / 10, s"$tmp/batch")
    // the ONE shared read+extract projection + dir copy (Bench owns them:
    // a re-implementation here once drifted from the timed front half)
    def pagesFrame(path: String) = Bench.pagesFrame(spark, path)
    def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit =
      Bench.copyDir(src, dst)

    val cores = Bench.coresOf(master)
    case class Line(name: String, discover: Seq[Double], discoverSlice: Seq[Double],
                    epoch: Seq[Double],
                    shuffleWriteMb: Seq[Double], shuffleReadMb: Seq[Double],
                    sliceShuffleReadMb: Seq[Double])
    val batchRows = numBase * 11 / 10 * graft.pages.PagesGen.variantKinds.length
    val lines = Seq(
      ("plain", DedupConfig()),
      // slice-keyed Bloom prune (state/SlicePrune.scala): same plain
      // layout, but the state side of the anti-join is filtered through a
      // sketch of the batch's urls first — the line measures what the
      // prune buys where it matters, the corpus-aged side's exchange
      ("plain_bloom", DedupConfig(stateBloomFpp = 0.01,
        stateBloomExpected = batchRows)),
      ("bucketed", DedupConfig(stateBuckets = cores))
    ).map { case (name, cfg) =>
      val base = java.nio.file.Paths.get(tmp, s"state_$name")
      Checkpoints.runEpoch(spark, pagesFrame(fullPath), "url", "text",
        base.toString, cfg)

      // read-only discover: warmup once, then reps timed with the ledger;
      // mirrors runEpoch's join shape including the optional bloom prune
      def discoverOnce(input: org.apache.spark.sql.DataFrame): (Double, Double, Double) = {
        Bench.dropPipelineState(spark)
        val t0 = System.nanoTime()
        val (_, l) = TaskSkewListener.measure(spark) {
          val state = Checkpoints.readSignatures(spark, base.toString)
            .select(col("id").as("url"))
          val keys =
            if (cfg.stateBloomFpp > 0)
              graft.state.SlicePrune.pruneByKeys(state, "url",
                input.select("url"), "url",
                cfg.stateBloomExpected, cfg.stateBloomFpp)
            else state
          input.join(keys, Seq("url"), "left_anti").count()
        }
        ((System.nanoTime() - t0) / 1e9,
          l.totalShuffleWriteBytes.get() / 1e6, l.totalShuffleReadBytes.get() / 1e6)
      }
      val batchFrame = pagesFrame(batchPath)
      // the nightly-crawl posture: a slice ≪ state (here ~9% of the batch,
      // spanning seen and new urls) resumed against the full state — the
      // shape where slice-keyed pruning pays; the full-batch surface keeps
      // the round-over-round protocol comparable
      val sliceFrame = batchFrame.filter(xxhash64(col("url")) % 11 === 0)
      discoverOnce(batchFrame) // warmup (codegen + file listing)
      val disc = (1 to reps).map(_ => discoverOnce(batchFrame))
      val discS = (1 to reps).map(_ => discoverOnce(sliceFrame))

      val epochs = (1 to reps).map { rep =>
        Bench.dropPipelineState(spark)
        val dir = java.nio.file.Paths.get(tmp, s"state_${name}_r$rep")
        copyDir(base, dir)
        val t0 = System.nanoTime()
        val (nNew, _) = Checkpoints.runEpoch(spark, pagesFrame(batchPath),
          "url", "text", dir.toString, cfg)
        val sec = (System.nanoTime() - t0) / 1e9
        require(nNew > 0, s"$name rep $rep resumed nothing")
        sec
      }
      Line(name, disc.map(_._1), discS.map(_._1), epochs,
        disc.map(_._2), disc.map(_._3), discS.map(_._3))
    }

    // delta-vs-full epoch CLUSTERING at the same tier — the flagship
    // incremental claim (epoch cost scales with the delta, not the
    // corpus). Production join defaults here (broadcast back on): the
    // delta machinery's semi-joins are delta-sized, and broadcasting them
    // IS the at-scale plan.
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    val clusterBase = java.nio.file.Paths.get(tmp, "state_cluster")
    // base state built WITH the flag so the band index exists — production
    // operating mode is "the flag is on every epoch"; the delta rep then
    // pays only its own epoch's index append, never the corpus bootstrap
    Checkpoints.clusterEpoch(spark, pagesFrame(fullPath), "url", "text",
      clusterBase.toString, DedupConfig(deltaCluster = true))
    // two delta fractions: the full re-cluster's cost is ~flat in the
    // delta (it re-pairs the whole corpus either way) while the delta
    // mode's cost shrinks with it — the scaling-with-the-delta evidence
    val pctBatches = Seq(
      (10, batchPath),
      (1, Bench.materializePages(spark, numBase * 101 / 100, s"$tmp/batch1")))
    // the slice (batch minus corpus) per fraction, materialized outside
    // timing: the slice-fed line feeds ONLY the new pages as input and the
    // batch table as the authoritative textsOf side-channel — the
    // 10^12-doc posture, where the full corpus is never re-fed
    val sliceOf = pctBatches.map { case (pct, path) =>
      val sp = s"$tmp/slice_$pct"
      spark.read.parquet(path)
        .join(spark.read.parquet(fullPath).select("url"), Seq("url"), "left_anti")
        .write.parquet(sp)
      pct -> sp
    }.toMap
    val clusterLines = pctBatches.flatMap { case (pct, path) =>
      Seq((s"cluster_full_$pct", DedupConfig(), path, Option.empty[String]),
          (s"cluster_delta_$pct", DedupConfig(deltaCluster = true), path, None),
          (s"cluster_slice_$pct", DedupConfig(deltaCluster = true),
            sliceOf(pct), Some(path)))
        .map { case (name, cfg, inPath, textsPath) =>
          // shuffle write bytes ride the task listener per rep: the ledger
          // evidence that the slice-fed delta epoch stops shuffling the
          // corpus (batch rows, text bytes) and ships only delta-sized sides
          val runsL = (1 to reps).map { rep =>
            Bench.dropPipelineState(spark)
            val dir = java.nio.file.Paths.get(tmp, s"state_${name}_r$rep")
            copyDir(clusterBase, dir)
            val t0 = System.nanoTime()
            val (_, l) = TaskSkewListener.measure(spark) {
              Checkpoints.clusterEpoch(spark, pagesFrame(inPath), "url", "text",
                dir.toString, cfg, textsOf = textsPath.map(pagesFrame))
            }
            ((System.nanoTime() - t0) / 1e9,
              l.totalShuffleWriteBytes.get() / 1e6)
          }
          (name, runsL.map(_._1), runsL.map(_._2))
        }
    }

    def med(xs: Seq[Double]) = Bench.median(xs)
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    val nPages = numBase * graft.pages.PagesGen.variantKinds.length
    val fields = lines.map { l =>
      s""""${l.name}":{"discover_sec":${f"${med(l.discover)}%.2f"},""" +
        s""""discover_runs":${arr(l.discover)},""" +
        s""""discover_slice_sec":${f"${med(l.discoverSlice)}%.2f"},""" +
        s""""discover_slice_runs":${arr(l.discoverSlice)},""" +
        s""""epoch_sec":${f"${med(l.epoch)}%.2f"},"epoch_runs":${arr(l.epoch)},""" +
        s""""shuffle_write_mb":${arr(l.shuffleWriteMb)},""" +
        s""""shuffle_read_mb":${arr(l.shuffleReadMb)},""" +
        s""""slice_shuffle_read_mb":${arr(l.sliceShuffleReadMb)}}"""
    }.mkString(",")
    val clusterFields = clusterLines.map { case (name, runs, shuffleMb) =>
      s""""$name":{"epoch_sec":${f"${med(runs)}%.2f"},"epoch_runs":${arr(runs)},""" +
        s""""shuffle_write_mb":${arr(shuffleMb)}}"""
    }.mkString(",")
    println(s"""{"metric":"resume_bench","state_pages":$nPages,""" +
      s""""master":"$master","reps":$reps,$fields,$clusterFields}""")
    spark.stop()
    // a 660k-tier run leaves ~10-16 GB of corpora + state copies; repeated
    // sessions fill the disk if the tool doesn't clean up after itself
    Bench.deleteTree(tmp, "resume-bench")
  }
}
