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
    containmentGate: Double = 0.5,
    containmentThreshold: Double = 0.9,
    saMaxChars: Int = 20000,
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
    // fused one-pass kernel (DocSignature): byte-compatible with the
    // combinator path but ~10× cheaper — the hot stage at 100 TB
    pages.select(
      (col(idCol).as("id") +: carry.map(col)) ++ Seq(
        Fingerprints.contentHash(col(textCol)).as("content_hash"),
        Fingerprints.docSignature(col(textCol), cfg.shingleK, cfg.numPerms).as("ds")): _*)
      .select(
        (col("id") +: carry.map(col)) ++ Seq(
          col("content_hash"),
          col("ds.simhash").as("simhash"),
          col("ds.shingles").as("shingles"),
          col("ds.minhash").as("minhash"),
          size(col("ds.shingles")).as("n_shingles")): _*)
  }

  /** Candidate pairs → verified near-dup edges.
    *
    * The verify stage re-joins the (pruned) signature table twice to fetch
    * shingle sets only for surviving candidates — the expensive columns
    * never travel through the band explode/self-join.
    *
    * @param texts optional (id, norm_text) frame enabling the authoritative
    *              suffix-array substring pass on the ambiguous slice; when
    *              absent, shingle-set containment decides alone (weaker:
    *              can over-accept reordered-block pairs).
    */
  def nearEdges(spark: SparkSession, sigs: DataFrame, cfg: DedupConfig,
                texts: Option[DataFrame] = None): DataFrame = {
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

    // verify, tier 1 (cheap, signature-only): a pair is a near-dup edge if —
    //  - exact shingle Jaccard ≥ threshold (the MinHash/enhanced-hash path), or
    //  - SimHash Hamming ≤ accept threshold (the reference's PRIMARY
    //    predicate, phash_threshold ≙ config.rs:51,105 — unrelated docs sit
    //    at hamming ≈ 32 ± 4, so ≤12 is a ~5σ acceptance).
    val shinglesDf = sigs.select(col("id"), col("shingles"))
    val scored = withHamming
      .join(shinglesDf.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(shinglesDf.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("ov", Fingerprints.shingleOverlap(col("sh_a"), col("sh_b")))
      .select(col("id_a"), col("id_b"), col("hamming"),
        col("ov.jaccard").as("jaccard"), col("ov.containment").as("containment"))
    val cheapAccept =
      col("jaccard") >= cfg.jaccardThreshold ||
        col("hamming") <= cfg.simhashAcceptHamming
    val accepted = scored.filter(cheapAccept).select("id_a", "id_b")

    // verify, tier 2 (asymmetric near-dups: truncation / quotation):
    // shingle-set containment GATES the candidate; the authoritative check
    // is the suffix-array substring pass (north_rule) — LCS/min(len) over
    // normalized text, fetched ONLY for this ambiguous slice so text bytes
    // never travel through the band explode / self-join / tier-1 verify.
    val ambiguous = scored
      .filter(!cheapAccept && col("containment") >= cfg.containmentGate)
      .select("id_a", "id_b")
    val saAccepted = texts match {
      case Some(t) =>
        ambiguous
          .join(t.select(col("id").as("id_a"), col("norm_text").as("nt_a")), "id_a")
          .join(t.select(col("id").as("id_b"), col("norm_text").as("nt_b")), "id_b")
          .withColumn("sa_cont", Fingerprints.saContainment(col("nt_a"), col("nt_b")))
          .filter(col("sa_cont") >= cfg.containmentThreshold)
          .select("id_a", "id_b")
      case None => // signature-only fallback: shingle containment decides
        scored.filter(!cheapAccept && col("containment") >= cfg.containmentThreshold)
          .select("id_a", "id_b")
    }

    accepted.union(saAccepted)
      .select(col("id_a").as("a"), col("id_b").as("b"))
  }

  /** Normalized-text side table for the suffix-array verify pass: capped at
    * `saMaxChars` (tiered-cost analog of the reference's size-tiered
    * downscale, `file_processing.rs:134-156`).
    */
  def normTexts(pages: DataFrame, idCol: String, textCol: String,
                cfg: DedupConfig): DataFrame =
    pages.select(col(idCol).as("id"),
      substring(Fingerprints.normalized(col(textCol)), 1, cfg.saMaxChars).as("norm_text"))

  /** Full run: returns the clusters table
    * (id, cluster_id, is_representative, kind) — kind ∈ {exact, near, unique}.
    *
    * Stage order is exact-first (the production web-dedup shape): the cheap
    * content-hash pass runs over a SLIM projection (id, hash, len — ~100 B/
    * row), and only ONE representative per content_hash is ever
    * fingerprinted or banded. This (a) keeps the wide shingle/minhash rows
    * out of the exact-stage shuffles, and (b) removes identical-text LSH
    * mega-buckets (the empty page, parked-domain boilerplate — they collide
    * in ALL bands and pair quadratically) by construction; exact-group
    * members reconnect to their rep (= group min id, matching exactEdges'
    * root) through union-find.
    */
  def run(spark: SparkSession, pages: DataFrame, idCol: String, textCol: String,
          cfg: DedupConfig = DedupConfig(),
          orderCols: DataFrame => Seq[org.apache.spark.sql.Column] = df =>
            Seq(col("order_len").desc, col("id").asc)): DataFrame = {

    def tick[T](name: String)(f: => T): T =
      if (sys.env.contains("GRAFT_TIMING")) {
        val t0 = System.nanoTime()
        val r = f
        System.err.println(f"[run] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        r
      } else f

    // slim exact-identity pass: nothing wider than the hash is shuffled
    val hashes = pages.select(
      col(idCol).as("id"),
      length(col(textCol)).as("order_len"),
      Fingerprints.contentHash(col(textCol)).as("content_hash"))
      .cache() // reused by: exact edges, hash counts, kind/order join, universe

    val exact = Clustering.exactEdges(hashes, "id", "content_hash")

    // one representative (min id ≡ exactEdges root) per content_hash enters
    // the near-dup stage; fingerprints are computed for reps ONLY
    val reps = hashes.groupBy("content_hash").agg(min(col("id")).as("id"))
      .select("id")
    val nearPages = pages
      .select(col(idCol).as("id"), col(textCol).as("__text"))
      .join(reps, Seq("id"), "left_semi")
      .cache() // read twice: fingerprints + SA-pass norm texts
    val sigs = signatures(nearPages, "id", "__text", cfg)
      .cache() // reused by band explode (×2 paths) + verify shingle re-join
    val near = tick("near edges (LSH+verify)") { nearEdges(spark, sigs, cfg,
      texts = Some(normTexts(nearPages, "id", "__text", cfg))).localCheckpoint(false) }
    val edges = exact.union(near)

    val clustered = tick("union-find") {
      Clustering.clusters(spark, hashes, "id", edges, cfg.maxUnionFindIters) }

    // kind: exact if the row shares a content_hash with ≥2 rows; near if in a
    // multi-row cluster otherwise; unique for singletons
    val hashCounts = hashes.groupBy("content_hash").agg(count(lit(1)).as("hash_n"))
    val clusterSizes = clustered.groupBy("cluster_id").agg(count(lit(1)).as("cluster_n"))

    val out = clustered
      .join(hashes, "id")
      .join(hashCounts, "content_hash")
      .join(clusterSizes, "cluster_id")
      .withColumn("kind",
        when(col("hash_n") > 1, lit("exact"))
          .when(col("cluster_n") > 1, lit("near"))
          .otherwise(lit("unique")))

    val withRep = Clustering.withRepresentatives(out, orderCols(out))
    val result = tick("kind+representative") {
      withRep.select("id", "cluster_id", "is_representative", "kind")
        // eager-materialize the (small) clusters table so the big intermediate
        // caches can be released immediately — downstream consumers read the
        // checkpointed rows instead of re-running the LSH/verify DAG
        .localCheckpoint() }
    sigs.unpersist()
    nearPages.unpersist()
    hashes.unpersist()
    result
  }
}
