package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.cluster.Clustering
import graft.pipeline.{DedupConfig, DedupPipeline}

/** Stage-level profiling of the dedup pipeline's MINHASH CHANNEL in the
  * order [[DedupPipeline.run]] composes it, over a pre-materialized parquet
  * corpus: times each stage with upstream materialized so shuffle/compute
  * hotspots are attributable per parallelism level.
  *
  * SCOPE — a deliberate simplification, not the production composition:
  * the containment band channels (prefix/anchor), the minhash-estimate
  * verify prefilter and the pair-key repartition before the suffix-array
  * kernel are all ABSENT here, so absolute stage times understate the
  * real pipeline's candidate volume and overstate its verify cost. Use
  * this tool to compare the SAME stage across parallelism levels or
  * code changes; use Bench/ScalingBench (which run the full
  * [[DedupPipeline.run]]) for anything end-to-end. Not part of the driver
  * contract — a tuning tool.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val numBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "4000").toLong
    val spark = Bench.sessionFor(cpus)
    import spark.implicits._
    val cfg = DedupConfig()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val tmp = Files.createTempDirectory("graft-profile").toString
    Bench.materializePages(spark, numBase, s"$tmp/full")
    val pages = spark.read.parquet(s"$tmp/full")

    val hashes = time("hashes (slim sha2)+cache") {
      val h = pages.select($"url".as("id"), length($"text").as("order_len"),
        graft.fingerprint.Fingerprints.contentHash($"text").as("content_hash")).cache()
      h.count(); h
    }
    val exact = time("exact edges") {
      val e = Clustering.exactEdges(hashes, "id", "content_hash").cache(); e.count(); e
    }
    val nearPages = time("reps semi-join+cache") {
      val reps = hashes.groupBy("content_hash").agg(min($"id").as("id")).select("id")
      val np = pages.select($"url".as("id"), $"text".as("__text"))
        .join(reps, Seq("id"), "left_semi").cache()
      np.count(); np
    }
    val sigs = time("signatures(reps)+cache") {
      val s = DedupPipeline.signatures(nearPages, "id", "__text", cfg).cache()
      s.count(); s
    }
    val pairs = time("candidate pairs") {
      val exploded = graft.lsh.LSH.explodeBands(sigs.select("id", "minhash", "simhash"),
        "id", "minhash", cfg.bands, cfg.rowsPerBand, carry = Seq("simhash"))
      val p = graft.lsh.LSH.candidatePairs(exploded, "id",
        cfg.hotBucketThreshold, cfg.saltFactor, cfg.maxBucketSize,
        carry = Seq("simhash")).cache()
      p.count(); p
    }
    val near = time("verify+SA (from cached pairs)") {
      // replicate nearEdges tiers over the cached pair set
      val withHamming = pairs
        .withColumn("hamming",
          graft.fingerprint.Fingerprints.hamming($"simhash_a", $"simhash_b"))
        .filter($"hamming" <= cfg.simhashMaxHamming)
        .select("id_a", "id_b", "hamming")
      val shinglesDf = sigs.select($"id", $"shingles")
      val scored = withHamming
        .join(shinglesDf.select($"id".as("id_a"), $"shingles".as("sh_a")), "id_a")
        .join(shinglesDf.select($"id".as("id_b"), $"shingles".as("sh_b")), "id_b")
        .withColumn("ov",
          graft.fingerprint.Fingerprints.shingleOverlap($"sh_a", $"sh_b"))
        .select($"id_a", $"id_b", $"hamming",
          $"ov.jaccard".as("jaccard"), $"ov.containment".as("containment"))
      val cheapAccept = $"jaccard" >= cfg.jaccardThreshold ||
        $"hamming" <= cfg.simhashAcceptHamming
      val accepted = scored.filter(cheapAccept).select("id_a", "id_b")
      val ambiguous = scored.filter(!cheapAccept && $"containment" >= cfg.containmentGate)
        .select("id_a", "id_b")
      val t = DedupPipeline.normTexts(nearPages, "id", "__text", cfg)
      val saAccepted = ambiguous
        .join(t.select($"id".as("id_a"), $"norm_text".as("nt_a")), "id_a")
        .join(t.select($"id".as("id_b"), $"norm_text".as("nt_b")), "id_b")
        .withColumn("sa_cont",
          graft.fingerprint.Fingerprints.saContainment($"nt_a", $"nt_b"))
        .filter($"sa_cont" >= cfg.containmentThreshold)
        .select("id_a", "id_b")
      val n = accepted.union(saAccepted)
        .select($"id_a".as("a"), $"id_b".as("b")).cache()
      n.count(); n
    }
    val clustered = time("union-find") {
      val c = Clustering.clusters(spark, hashes, "id", exact.union(near),
        cfg.maxUnionFindIters).cache()
      c.count(); c
    }
    time("kind+representative+count") {
      val hashCounts = hashes.groupBy("content_hash").agg(count(lit(1)).as("hash_n"))
      val clusterSizes = clustered.groupBy("cluster_id").agg(count(lit(1)).as("cluster_n"))
      val out = clustered
        .join(hashes, "id")
        .join(hashCounts, "content_hash")
        .join(clusterSizes, "cluster_id")
        .withColumn("kind", when($"hash_n" > 1, "exact")
          .when($"cluster_n" > 1, "near").otherwise("unique"))
      Clustering.withRepresentatives(out, Seq($"order_len".desc, $"id".asc)).count()
    }
    spark.stop()
  }
}
