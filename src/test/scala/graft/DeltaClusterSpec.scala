package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pages.PagesGen
import graft.pipeline.DedupConfig
import graft.state.Checkpoints

/** Delta-incremental clustering (DedupConfig.deltaCluster): near-pair
  * discovery runs only over the re-verify frontier while prior
  * connectivity enters union-find as assignment edges. These specs pin
  * COMPONENT EQUIVALENCE with the full re-cluster — same cluster
  * partition, same min-id labels, same kinds, same representatives — on
  * the planted corpus, including the executed-removal invalidation path.
  */
class DeltaClusterSpec extends SparkTestBase {
  import spark.implicits._

  private def tempDir(): String =
    Files.createTempDirectory("graft-delta").toString

  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
  }

  private def clustersOf(dir: String): Set[(String, String, Boolean, String)] =
    spark.read.parquet(Checkpoints.clustersPath(dir))
      .select("id", "cluster_id", "is_representative", "kind")
      .as[(String, String, Boolean, String)].collect().toSet

  test("delta epoch ≡ full re-cluster: new docs join, labels/kinds/reps identical") {
    val base = tempDir()
    val all = PagesGen.pages(spark, 10L, seed = 41L, tokensPerDoc = 120).toDF().cache()
    val half = all.filter(xxhash64($"url") % 2 === 0)
    // epoch 1 (full) builds the shared starting state
    Checkpoints.clusterEpoch(spark, half, "url", "text", base)
    val fullDir = tempDir() + "/s"
    val deltaDir = tempDir() + "/s"
    copyDir(base, fullDir)
    copyDir(base, deltaDir)
    // epoch 2 over the full pages frame, once per mode
    Checkpoints.clusterEpoch(spark, all, "url", "text", fullDir)
    Checkpoints.clusterEpoch(spark, all, "url", "text", deltaDir,
      DedupConfig(deltaCluster = true))
    assert(clustersOf(deltaDir) == clustersOf(fullDir),
      "delta clustering diverged from the full re-cluster")
    all.unpersist()
  }

  test("forceRescan invalidates clusters + band index: rescan-then-delta matches full") {
    val dir = tempDir()
    val v1 = PagesGen.pages(spark, 8L, seed = 44L, tokensPerDoc = 120).toDF()
    Checkpoints.clusterEpoch(spark, v1, "url", "text", dir,
      DedupConfig(deltaCluster = true))
    // the store restarts over a DIFFERENT corpus (dropped + new docs) —
    // the pre-rescan clusters/bands describe signatures that no longer
    // exist and must not be spliced into the next delta epoch
    val v2 = PagesGen.pages(spark, 6L, seed = 45L, tokensPerDoc = 120).toDF()
    Checkpoints.runEpoch(spark, v2, "url", "text", dir,
      DedupConfig(forceRescan = true))
    val fsc = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(!fsc.exists(new org.apache.hadoop.fs.Path(Checkpoints.clustersPath(dir))),
      "rescan must drop the stale clusters table")
    assert(!fsc.exists(new org.apache.hadoop.fs.Path(Checkpoints.bandsPath(dir))),
      "rescan must drop the stale band index")
    // the next delta epoch finds no prior clusters → full path → identical
    // to a from-scratch full cluster over the same corpus
    Checkpoints.clusterEpoch(spark, v2.limit(0), "url", "text", dir,
      DedupConfig(deltaCluster = true))
    val fresh = tempDir()
    Checkpoints.clusterEpoch(spark, v2, "url", "text", fresh)
    assert(clustersOf(dir) == clustersOf(fresh),
      "rescan-then-delta must equal the from-scratch clustering")
  }

  test("executed removals invalidate their clusters; delta still matches full") {
    val base = tempDir()
    val all = PagesGen.pages(spark, 8L, seed = 42L, tokensPerDoc = 120).toDF().cache()
    val half = all.filter(xxhash64($"url") % 2 === 0)
    // epoch 1 clusters and EXECUTES deletions — tombstones sever members,
    // so the affected clusters' assignment edges cannot be trusted
    Checkpoints.clusterEpoch(spark, half, "url", "text", base, action = "delete")
    val (nExec, nFail) = Checkpoints.executeEpoch(spark, base, None)
    assert(nExec > 0 && nFail == 0)
    val fullDir = tempDir() + "/s"
    val deltaDir = tempDir() + "/s"
    copyDir(base, fullDir)
    copyDir(base, deltaDir)
    Checkpoints.clusterEpoch(spark, all, "url", "text", fullDir)
    Checkpoints.clusterEpoch(spark, all, "url", "text", deltaDir,
      DedupConfig(deltaCluster = true))
    assert(clustersOf(deltaDir) == clustersOf(fullDir),
      "delta clustering diverged after executed removals")
    all.unpersist()
  }

  test("no-change delta epoch: zero new docs, clusters identical, frontier empty") {
    val dir = tempDir()
    val pages = PagesGen.pages(spark, 6L, seed = 43L, tokensPerDoc = 120).toDF()
    Checkpoints.clusterEpoch(spark, pages, "url", "text", dir)
    val before = clustersOf(dir)
    val (nNew, _) = Checkpoints.clusterEpoch(spark, pages, "url", "text", dir,
      DedupConfig(deltaCluster = true))
    assert(nNew == 0L)
    assert(clustersOf(dir) == before,
      "an empty delta epoch must reproduce the clusters table exactly")
  }

  test("fast-path delta epoch ≡ fast-path full re-cluster") {
    val base = tempDir()
    val fast = DedupConfig(fastPath = true)
    val all = PagesGen.pages(spark, 8L, seed = 45L, tokensPerDoc = 120).toDF().cache()
    val half = all.filter(xxhash64($"url") % 2 === 0)
    Checkpoints.clusterEpoch(spark, half, "url", "text", base, fast)
    val fullDir = tempDir() + "/s"
    val deltaDir = tempDir() + "/s"
    copyDir(base, fullDir)
    copyDir(base, deltaDir)
    Checkpoints.clusterEpoch(spark, all, "url", "text", fullDir, fast)
    Checkpoints.clusterEpoch(spark, all, "url", "text", deltaDir,
      fast.copy(deltaCluster = true))
    assert(clustersOf(deltaDir) == clustersOf(fullDir),
      "fast-path delta clustering diverged from the fast-path full re-cluster")
    all.unpersist()
  }

  test("frontier-selection plan: delta-sized sides broadcast, corpus side never sort-merges") {
    import graft.pipeline.DedupPipeline
    val cfg = DedupConfig()
    val sigs = DedupPipeline.signatures(
      PagesGen.pages(spark, 8L, seed = 46L, tokensPerDoc = 120).toDF(),
      "url", "text", cfg)
    val focus = sigs.select("id").limit(3)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // compile-time plan must already be the at-scale one: the corpus-wide
      // banding projection joins the (delta-sized) focus and hot-bucket sets
      // as BROADCAST semi-joins — a sort-merge join here would shuffle the
      // full corpus's band rows every delta epoch, erasing the mode's point
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val mates = DedupPipeline.bucketMates(sigs, focus, cfg)
      val plan = mates.queryExecution.executedPlan
      val smj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.isEmpty, s"corpus-side band rows must never sort-merge:\n$plan")
      val bhj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      assert(bhj.length >= 2, s"expected broadcast semi-joins (focus + hot):\n$plan")
      // only delta-sized rows may exchange on the band keys: every
      // (band, band_hash)-partitioned shuffle must live INSIDE a broadcast
      // (hot-side) subtree — a band-keyed shuffle in the main lineage would
      // be the corpus-wide banding projection repartitioning every epoch.
      // (Catalyst pushes the semi-join through the channel union, so the
      // small hot set legitimately re-shuffles once per broadcast branch.)
      import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
      val inBroadcast = plan.collect { case b: BroadcastExchangeExec => b }
        .flatMap(_.collect { case e: ShuffleExchangeExec => e }).toSet
      val mainLineage = plan.collect { case e: ShuffleExchangeExec => e }
        .filterNot(inBroadcast)
      val bandKeyed = mainLineage.filter(
        _.outputPartitioning.toString.contains("band"))
      assert(bandKeyed.isEmpty,
        s"corpus-wide band rows must never repartition in the main lineage:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("band index: built, gap-repaired across non-delta epochs, rebuilt on knob change") {
    import graft.pipeline.DedupPipeline
    val dir = tempDir()
    val cfg = DedupConfig(deltaCluster = true)
    val p1 = PagesGen.pages(spark, 5L, seed = 47L, tokensPerDoc = 80).toDF()
    val p2 = PagesGen.pages(spark, 8L, seed = 47L, tokensPerDoc = 80).toDF()
    Checkpoints.clusterEpoch(spark, p1, "url", "text", dir, cfg)
    // first delta epoch bootstraps the index over ALL committed epochs
    Checkpoints.clusterEpoch(spark, p2, "url", "text", dir, cfg)
    def indexRows(): Set[(String, Int, Long)] =
      spark.read.parquet(Checkpoints.bandsPath(dir))
        .as[(String, Int, Long)].collect().toSet
    def freshRows(c: DedupConfig): Set[(String, Int, Long)] =
      DedupPipeline.allChannelBandRows(
        Checkpoints.readSignatures(spark, dir), c, includeFast = true)
        .as[(String, Int, Long)].collect().toSet
    assert(indexRows() == freshRows(cfg),
      "index after bootstrap must equal freshly computed channel rows")

    // an interleaved NON-delta epoch leaves the index behind; the next
    // delta epoch's ensure call repairs exactly the gap
    val p3 = PagesGen.pages(spark, 11L, seed = 47L, tokensPerDoc = 80).toDF()
    Checkpoints.clusterEpoch(spark, p3, "url", "text", dir) // full mode
    val p4 = PagesGen.pages(spark, 13L, seed = 47L, tokensPerDoc = 80).toDF()
    Checkpoints.clusterEpoch(spark, p4, "url", "text", dir, cfg)
    assert(indexRows() == freshRows(cfg),
      "gap repair must cover epochs committed while delta mode was off")

    // changing a channel knob invalidates the marker: full rebuild
    val recfg = cfg.copy(anchorModulus = cfg.anchorModulus + 2)
    val idx = Checkpoints.ensureBandIndex(spark, dir, recfg)
    assert(idx.count() == freshRows(recfg).size)
    assert(indexRows() == freshRows(recfg),
      "knob change must rebuild the index under the new channel shapes")
  }

  test("compaction prunes tombstoned docs from the band index") {
    val dir = tempDir()
    val cfg = DedupConfig(deltaCluster = true)
    val pages = PagesGen.pages(spark, 6L, seed = 48L, tokensPerDoc = 80).toDF()
    Checkpoints.clusterEpoch(spark, pages, "url", "text", dir, cfg, action = "delete")
    Checkpoints.clusterEpoch(spark, pages, "url", "text", dir, cfg) // builds index
    val (nExec, _) = Checkpoints.executeEpoch(spark, dir, None)
    assert(nExec > 0)
    val tombIds = Checkpoints.tombstones(spark, dir).select("id")
      .as[String].collect().toSet
    val before = spark.read.parquet(Checkpoints.bandsPath(dir))
      .select("id").as[String].collect().toSet
    assert(tombIds.subsetOf(before), "setup: tombstoned ids were indexed")
    Checkpoints.compactSignatures(spark, dir)
    val after = spark.read.parquet(Checkpoints.bandsPath(dir))
      .select("id").as[String].collect().toSet
    assert(after.intersect(tombIds).isEmpty, "tombstoned ids must be pruned")
    assert(after == before.diff(tombIds), "live ids must survive compaction")
    // and the next delta epoch still works over the compacted index
    val more = PagesGen.pages(spark, 9L, seed = 48L, tokensPerDoc = 80).toDF()
    val (_, nc) = Checkpoints.clusterEpoch(spark, more, "url", "text", dir, cfg)
    assert(nc > 0)
  }

  test("delta composes with the bucketed state layout") {
    val base = tempDir()
    val cfg = DedupConfig(deltaCluster = true, stateBuckets = 8)
    val all = PagesGen.pages(spark, 8L, seed = 49L, tokensPerDoc = 120).toDF().cache()
    val half = all.filter(xxhash64($"url") % 2 === 0)
    Checkpoints.clusterEpoch(spark, half, "url", "text", base, cfg)
    val fullDir = tempDir() + "/s"
    val deltaDir = tempDir() + "/s"
    copyDir(base, fullDir)
    copyDir(base, deltaDir)
    // the full control keeps the (sticky) bucket layout but clusters fully
    Checkpoints.clusterEpoch(spark, all, "url", "text", fullDir,
      DedupConfig(stateBuckets = 8))
    Checkpoints.clusterEpoch(spark, all, "url", "text", deltaDir, cfg)
    assert(clustersOf(deltaDir) == clustersOf(fullDir),
      "delta clustering diverged from full under the bucketed layout")
    all.unpersist()
  }

  test("slice-fed delta epoch ≡ full-fed full re-cluster (textsOf side-channel)") {
    val base = tempDir()
    val cfg = DedupConfig(deltaCluster = true)
    val all = PagesGen.pages(spark, 8L, seed = 51L, tokensPerDoc = 120).toDF().cache()
    val half = all.filter(xxhash64($"url") % 2 === 0)
    val slice = all.filter(xxhash64($"url") % 2 =!= 0)
    Checkpoints.clusterEpoch(spark, half, "url", "text", base, cfg)
    val fullDir = tempDir() + "/s"
    val sliceDir = tempDir() + "/s"
    copyDir(base, fullDir)
    copyDir(base, sliceDir)
    // control: the whole corpus re-fed, full re-cluster
    Checkpoints.clusterEpoch(spark, all, "url", "text", fullDir)
    // slice-fed: ONLY the new pages enter as input; the authoritative
    // table rides textsOf so the verify pass can fetch old-doc text for
    // frontier pairs — the 10^12-doc posture, where re-feeding the corpus
    // every epoch is not an option
    Checkpoints.clusterEpoch(spark, slice, "url", "text", sliceDir, cfg,
      textsOf = Some(all))
    assert(clustersOf(sliceDir) == clustersOf(fullDir),
      "slice-fed delta epoch diverged from the full-fed full re-cluster")
    all.unpersist()
  }

  test("epochs accrued between cluster passes (streamed cadence): delta still matches full") {
    // the streaming posture commits SIGNATURE epochs without clustering
    // (streamingIngest per micro-batch, or repeated runEpoch); the next
    // cadence clusterEpoch must re-verify EVERY never-clustered doc, not
    // just the one epoch its own runEpoch committed
    val base = tempDir()
    val cfg = DedupConfig(deltaCluster = true)
    val all = PagesGen.pages(spark, 9L, seed = 53L, tokensPerDoc = 120).toDF().cache()
    val third = all.filter(xxhash64($"url") % 3 === 0)
    val twoThirds = all.filter(xxhash64($"url") % 3 <= 1)
    Checkpoints.clusterEpoch(spark, third, "url", "text", base, cfg)
    // two un-clustered signature epochs accrue on the SAME state
    Checkpoints.runEpoch(spark, twoThirds, "url", "text", base, cfg)
    Checkpoints.runEpoch(spark, all, "url", "text", base, cfg)
    val fullDir = tempDir() + "/s"
    val deltaDir = tempDir() + "/s"
    copyDir(base, fullDir)
    copyDir(base, deltaDir)
    Checkpoints.clusterEpoch(spark, all, "url", "text", fullDir)
    Checkpoints.clusterEpoch(spark, all, "url", "text", deltaDir, cfg)
    assert(clustersOf(deltaDir) == clustersOf(fullDir),
      "delta clustering lost near edges for docs from accrued epochs")
    all.unpersist()
  }

  test("first epoch with deltaCluster set falls back to the full path") {
    val dir = tempDir()
    val pages = PagesGen.pages(spark, 5L, seed = 44L, tokensPerDoc = 120).toDF()
    val (n, nc) = Checkpoints.clusterEpoch(spark, pages, "url", "text", dir,
      DedupConfig(deltaCluster = true))
    assert(n == 5L * PagesGen.variantKinds.length && nc > 0)
    // and the result matches a plain full first epoch
    val ref = tempDir()
    Checkpoints.clusterEpoch(spark, pages, "url", "text", ref)
    assert(clustersOf(dir) == clustersOf(ref))
  }
}
