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
