package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cluster.Clustering
import graft.fingerprint.Fingerprints
import graft.lsh.LSH

/** Job configuration — the analog of the reference `Config`
  * (image-deduper `src/config.rs:37-126`): `simhashMaxHamming` plays
  * `phash_threshold` (`config.rs:51,105`), `forceRescan` plays
  * `force_rescan` (`config.rs:81`), the LSH/salt knobs play the
  * batch/memory throttles (`lib.rs:144-223`).
  */
case class DedupConfig(
    shingleK: Int = 3,
    numPerms: Int = Fingerprints.NumPerms,
    bands: Int = Fingerprints.DefaultBands,
    rowsPerBand: Int = Fingerprints.DefaultRowsPerBand,
    simhashMaxHamming: Int = 28,
    simhashAcceptHamming: Int = 12,
    jaccardThreshold: Double = 0.5,
    containmentThreshold: Double = 0.9,
    hotBucketThreshold: Int = 200,
    saltFactor: Int = 16,
    maxBucketSize: Int = 100000,
    maxUnionFindIters: Int = 25,
    forceRescan: Boolean = false) {
  require(bands * rowsPerBand == numPerms,
    s"bands*rowsPerBand must equal numPerms ($bands*$rowsPerBand != $numPerms)")
}

/** End-to-end near-duplicate detection + clustering over a pages-shaped
  * frame — the flagship query (SURVEY.md §3.3):
  *
  * pages → signatures → LSH bands → salted candidate pairs → simhash
  * prefilter → exact-Jaccard + containment verify → (∪ exact edges) →
  * union-find → clusters → representative window.
  */
object DedupPipeline {

  /** Per-row fingerprint stage (no shuffle; pure projection).
    * Input must have (id, text [, warc_ts]). Output:
    * (id, content_hash, simhash, minhash, shingles, n_shingles [, carried]).
    */
  def signatures(pages: DataFrame, idCol: String, textCol: String,
                 cfg: DedupConfig, carry: Seq[String] = Nil): DataFrame = {
    val sh = Fingerprints.shingleHashes(col(textCol), cfg.shingleK)
    pages.select(
      (col(idCol).as("id") +: carry.map(col)) ++ Seq(
        Fingerprints.contentHash(col(textCol)).as("content_hash"),
        Fingerprints.simhash(col(textCol)).as("simhash"),
        sh.as("shingles")): _*)
      .withColumn("minhash", Fingerprints.minhashOfHashes(col("shingles"), cfg.numPerms))
      .withColumn("n_shingles", size(col("shingles")))
  }

  /** Candidate pairs → verified near-dup edges.
    *
    * The verify stage re-joins the (pruned) signature table twice to fetch
    * shingle sets only for surviving candidates — the expensive columns
    * never travel through the band explode/self-join.
    */
  def nearEdges(spark: SparkSession, sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val slim = sigs.select("id", "minhash", "simhash")
    val exploded = LSH.explodeBands(slim, "id", "minhash",
      cfg.bands, cfg.rowsPerBand, carry = Seq("simhash"))
    val pairs = LSH.candidatePairs(exploded, "id",
      hotThreshold = cfg.hotBucketThreshold,
      saltFactor = cfg.saltFactor,
      maxBucketSize = cfg.maxBucketSize,
      carry = Seq("simhash"))

    // cheap prefilter: 64-bit SimHash Hamming (reference PHash::is_similar,
    // processing/types.rs:47-58) before touching shingle arrays
    val withHamming = pairs
      .withColumn("hamming", Fingerprints.hamming(col("simhash_a"), col("simhash_b")))
      .filter(col("hamming") <= cfg.simhashMaxHamming)
      .select("id_a", "id_b", "hamming")

    // verify: a pair is a near-dup edge if ANY fingerprint agrees —
    //  - exact shingle Jaccard ≥ threshold (the MinHash/enhanced-hash path),
    //  - containment ≥ threshold (truncation/quotation asymmetric dups), or
    //  - SimHash Hamming ≤ accept threshold (the reference's PRIMARY
    //    predicate, phash_threshold ≙ config.rs:51,105 — unrelated docs sit
    //    at hamming ≈ 32 ± 4, so ≤12 is a ~5σ acceptance).
    val shinglesDf = sigs.select(col("id"), col("shingles"))
    val verified = withHamming
      .join(shinglesDf.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(shinglesDf.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard", Fingerprints.exactJaccard(col("sh_a"), col("sh_b")))
      .withColumn("containment", Fingerprints.containment(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= cfg.jaccardThreshold ||
        col("containment") >= cfg.containmentThreshold ||
        col("hamming") <= cfg.simhashAcceptHamming)
    verified.select(col("id_a").as("a"), col("id_b").as("b"))
  }

  /** Full run: returns the clusters table
    * (id, cluster_id, is_representative, kind) — kind ∈ {exact, near, unique}.
    */
  def run(spark: SparkSession, pages: DataFrame, idCol: String, textCol: String,
          cfg: DedupConfig = DedupConfig(),
          orderCols: DataFrame => Seq[org.apache.spark.sql.Column] = df =>
            Seq(col("order_len").desc, col("id").asc)): DataFrame = {

    val sigs = signatures(
      pages.withColumn("order_len", length(col(textCol))),
      idCol, textCol, cfg, carry = Seq("order_len"))
    sigs.cache() // reused by: exact edges, band explode, verify re-join

    val exact = Clustering.exactEdges(sigs, "id", "content_hash")
    val near = nearEdges(spark, sigs, cfg)
    val edges = exact.union(near)

    val clustered = Clustering.clusters(spark, sigs, "id", edges, cfg.maxUnionFindIters)

    // kind: exact if the row shares a content_hash with ≥2 rows; near if in a
    // multi-row cluster otherwise; unique for singletons
    val hashCounts = sigs.groupBy("content_hash").agg(count(lit(1)).as("hash_n"))
    val clusterSizes = clustered.groupBy("cluster_id").agg(count(lit(1)).as("cluster_n"))

    val out = clustered
      .join(sigs.select(col("id"), col("content_hash"), col("order_len")), "id")
      .join(hashCounts, "content_hash")
      .join(clusterSizes, "cluster_id")
      .withColumn("kind",
        when(col("hash_n") > 1, lit("exact"))
          .when(col("cluster_n") > 1, lit("near"))
          .otherwise(lit("unique")))

    val withRep = Clustering.withRepresentatives(out, orderCols(out))
    val result = withRep.select("id", "cluster_id", "is_representative", "kind")
    result
  }
}
