package graft.state

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{DedupConfig, DedupPipeline}

/** Incremental state, resume, quarantine and metrics — the analog of the
  * reference's persistence layer (image-deduper `src/persistence/db.rs`):
  *
  *  - the RocksDB twin-key store (`db.rs:79-84`) becomes a `signatures`
  *    Parquet/Iceberg table (one row per url — both hashes are columns, so
  *    the `diagnose_database` half-row scan `db.rs:213-278` is impossible
  *    by construction);
  *  - `find_new_images` chunked point-lookups (`db.rs:132-164`) become one
  *    distributed LEFT ANTI join — the resume primitive;
  *  - the problematic-file skip list
  *    (`processing/utils/hash_computation_with_timeout.rs:19-42`) becomes a
  *    persistent `quarantine` table, anti-joined before processing;
  *  - flush/compact cadence (`lib.rs:178-223`) becomes an epoch manifest:
  *    each run appends one epoch (≙ Iceberg snapshot commit) recorded in
  *    `_manifest.jsonl`, giving resumable, inspectable commits in-sandbox.
  */
object Checkpoints {

  def signaturesPath(stateDir: String) = s"$stateDir/signatures"
  def quarantinePath(stateDir: String) = s"$stateDir/quarantine"
  def metricsPath(stateDir: String) = s"$stateDir/metrics"
  def clustersPath(stateDir: String) = s"$stateDir/clusters"
  def previewsPath(stateDir: String) = s"$stateDir/previews"
  def actionsPath(stateDir: String) = s"$stateDir/actions"
  def executedPath(stateDir: String) = s"$stateDir/executed"
  def bandsPath(stateDir: String) = s"$stateDir/bands"
  def bandsMarkerPath(stateDir: String) = s"$stateDir/_bands.json"
  def manifestPath(stateDir: String) = s"$stateDir/_manifest.jsonl"
  def lockPath(stateDir: String) = s"$stateDir/_lock"
  def layoutPath(stateDir: String) = s"$stateDir/_layout.json"

  /** All state IO goes through the Hadoop FileSystem API so `stateDir` may
    * be any supported URI (file://, hdfs://, s3a://, …) — java.nio would
    * silently bind the manifest to the DRIVER'S local disk on a real
    * cluster while the parquet tables land on the distributed store.
    */
  /** Read one long out of an observe metric after its carrying action ran —
    * the single-pass epoch-accounting primitive (counts ride the write
    * jobs; empty-relation-pruned metric nodes read as 0).
    */
  private def observedLong(obs: org.apache.spark.sql.Observation, idx: Int): Long = {
    val row = scala.concurrent.Await.result(obs.future,
      scala.concurrent.duration.Duration(120, "s"))
    if (row.length == 0) 0L else row.getLong(idx)
  }

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = fsFor(spark, path)
    fs.exists(p)
  }

  def readIfExists(spark: SparkSession, path: String): Option[DataFrame] =
    if (exists(spark, path)) Some(spark.read.parquet(path)) else None

  // ------------------------------------------------------------------
  // Signatures physical layout (plain parquet vs bucketed table).
  //
  // The layout is a property of the STATE DIR, not of the caller's config:
  // it is recorded in `_layout.json` at first write, and every later
  // reader and writer — including fresh sessions and other drivers —
  // discovers it from the marker, so all parties agree on the physical
  // layout without coordinating configs. Spark's bucket metadata lives in
  // the session catalog (in-memory, per-session), so each session
  // re-registers the same deterministic table name over the same files on
  // first touch; the files themselves carry the bucket ids in their names.
  // ------------------------------------------------------------------

  /** Buckets the persisted signatures were written with; 0 = plain parquet. */
  private[graft] def signatureBuckets(spark: SparkSession, stateDir: String): Int = {
    val (fs, p) = fsFor(spark, layoutPath(stateDir))
    SubDocState.markerInt(fs, p, "signature_buckets").getOrElse(0)
  }

  private def writeLayout(spark: SparkSession, stateDir: String, buckets: Int): Unit = {
    val (fs, p) = fsFor(spark, layoutPath(stateDir))
    val out = fs.create(p, true)
    try out.write(s"""{"signature_buckets":$buckets}""".getBytes(UTF_8))
    finally out.close()
  }

  /** Deterministic per-state-dir catalog name (the in-memory catalog is
    * per-session; every session derives the same name for the same dir).
    */
  private[graft] def sigTableName(spark: SparkSession, stateDir: String): String = {
    val (_, root) = fsFor(spark, signaturesPath(stateDir))
    SubDocState.tableName("graft_sigs_", root)
  }

  /** Companion table name for the executed-actions table (same naming
    * scheme as [[sigTableName]]; both id-keyed tables share the store's
    * one recorded bucket layout).
    */
  private[graft] def execTableName(spark: SparkSession, stateDir: String): String = {
    val (_, root) = fsFor(spark, executedPath(stateDir))
    SubDocState.tableName("graft_exec_", root)
  }

  /** Register (if absent) a bucketed table over existing state files and
    * return its name. Schema comes from the parquet footers so
    * registration works in a session that has never written this state.
    */
  private def ensureBucketedTable(spark: SparkSession, tbl: String, path: String,
                                  buckets: Int): String = {
    if (!spark.catalog.tableExists(tbl)) {
      val schema = spark.read.parquet(path).schema
      val (_, root) = fsFor(spark, path)
      spark.sql(
        s"""CREATE TABLE $tbl (${schema.toDDL}) USING PARQUET
           |CLUSTERED BY (id) SORTED BY (id) INTO $buckets BUCKETS
           |LOCATION '${root.toString}'""".stripMargin)
    }
    // another driver may have appended an epoch since this session cached
    // the file listing; the lease serializes writers, not readers
    spark.catalog.refreshTable(tbl)
    tbl
  }

  private def ensureSigTable(spark: SparkSession, stateDir: String, buckets: Int): String =
    ensureBucketedTable(spark, sigTableName(spark, stateDir),
      signaturesPath(stateDir), buckets)

  /** Layout-aware read of the executed-actions table; None if no action
    * ever executed. The executed table shares the store's bucket layout:
    * its hottest consumer is [[liveSignatures]]'s tombstone anti-join on
    * `id` — with BOTH scans carrying HashPartitioning(id, N), the live
    * view is computed with zero exchange (pinned by BucketedStateSpec).
    */
  def readExecuted(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    if (!exists(spark, executedPath(stateDir))) None
    else {
      val b = signatureBuckets(spark, stateDir)
      if (b > 0)
        Some(spark.table(ensureBucketedTable(spark,
          execTableName(spark, stateDir), executedPath(stateDir), b)))
      else readIfExists(spark, executedPath(stateDir))
    }
  }

  /** Point lookup over the signature store — the reference's
    * `find_new_images` chunked RocksDB point-lookups (db.rs:132-164)
    * re-expressed for the bucketed layout: an id equality/IN predicate
    * prunes the scan to the matching buckets (`SelectedBucketsCount:
    * k out of N` in the plan), reading ~k/N of the store's files — the
    * closest a distributed columnar store gets to an O(1) keyed get, and
    * what makes "inspect these 50 urls" interactive on a 10^12-row store.
    * Plain layout falls back to a full scan with the filter pushed to
    * parquet. Pruning is pinned by BucketedStateSpec.
    */
  def signaturesFor(spark: SparkSession, stateDir: String,
                    ids: Seq[String]): DataFrame =
    readSignatures(spark, stateDir).filter(col("id").isin(ids: _*))

  /** Layout-aware scan of the persisted signatures. In the bucketed layout
    * the scan carries HashPartitioning(id, N), so the resume/tombstone/
    * as-of anti-joins on `id` need no exchange on the state side — the
    * side that grows with corpus age (see DedupConfig.stateBuckets).
    */
  def readSignatures(spark: SparkSession, stateDir: String): DataFrame = {
    val b = signatureBuckets(spark, stateDir)
    if (b > 0) spark.table(ensureSigTable(spark, stateDir, b))
    else spark.read.parquet(signaturesPath(stateDir))
  }

  /** Single-writer lease over a state dir. The reference's single-process
    * RocksDB handle made concurrent writers impossible (`db.rs` opens the
    * store exclusively); on a cluster two drivers pointed at one stateDir
    * would interleave the manifest's double-rename and parquet appends, so
    * every mutating epoch runs inside this lease.
    *
    * `FileSystem.create(path, overwrite = false)` is atomic on HDFS-like
    * stores (and good enough on local FS for tests); the loser gets a clean
    * IllegalStateException instead of a corrupted store. A lease older than
    * `staleMs` is treated as abandoned by a crashed holder and broken —
    * epochs are minutes-long, so the default 30 min bound never fences out
    * a live writer. (On S3, creation is not atomic; front a real lock
    * service or DynamoDB-style conditional put there.)
    */
  /** Thrown when the state lease is held by another writer. Subclasses
    * IllegalStateException so existing catch sites keep working; a distinct
    * type so retry loops (streaming ingest under a batch clusterEpoch) can
    * match contention without parsing messages.
    */
  final class StateLockedException(msg: String, cause: Throwable = null)
    extends IllegalStateException(msg, cause)

  /** Test seam: runs between the staleness observation and the takeover
    * rename so a spec can interleave a competing writer deterministically
    * inside the otherwise-nanoseconds takeover window.
    */
  private[graft] var lockTakeoverTestHook: () => Unit = () => ()

  def withStateLock[T](spark: SparkSession, stateDir: String,
                       staleMs: Long = 30L * 60 * 1000)(f: => T): T = {
    val (fs, root) = fsFor(spark, stateDir)
    fs.mkdirs(root)
    val lp = new Path(lockPath(stateDir))
    def locked(cause: Throwable): Nothing =
      throw new StateLockedException(
        s"state dir is locked by another writer (${lockPath(stateDir)}); " +
          "concurrent epochs over one state dir are not supported", cause)
    if (fs.exists(lp) &&
        System.currentTimeMillis() - fs.getFileStatus(lp).getModificationTime > staleMs) {
      lockTakeoverTestHook()
      // Break the abandoned lease by ATOMIC RENAME to a unique name — never
      // delete in place. Between our staleness check and this point another
      // racer may have broken the stale lock AND a third writer re-created a
      // FRESH one at the same path; a delete here would destroy that live
      // lease (the check-then-act race). Rename moves whatever file holds
      // the lock path right now; re-statting what we actually took tells us
      // whose it was: fresh → restore it and fail as locked, stale → discard
      // it and contend for the create below like everyone else.
      val broken = new Path(lockPath(stateDir) + s".broken.${System.nanoTime()}")
      val renamed =
        try fs.rename(lp, broken)
        catch { case _: java.io.IOException => false } // racer broke it first
      if (renamed) {
        val tookMtime = fs.getFileStatus(broken).getModificationTime
        if (System.currentTimeMillis() - tookMtime <= staleMs) {
          // we grabbed a fresh lease created inside our takeover window —
          // put it back (we hold it exclusively under the unique name, so
          // only a writer two races deep could have re-created the path)
          fs.rename(broken, lp)
          locked(null)
        }
        fs.delete(broken, false)
      }
    }
    val out =
      try fs.create(lp, false)
      catch { case e: java.io.IOException => locked(e) }
    // unique holder token: release must verify the lease is still OURS —
    // an epoch that outlives staleMs can have its lock legitimately broken
    // by a newer writer, and an unconditional delete here would destroy
    // that writer's LIVE lease (opening the store to a third concurrent
    // writer — exactly the interleaving the lease exists to prevent)
    val holderToken =
      s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}/${java.util.UUID.randomUUID()}"
    try out.write(
      (s"""{"holder":"$holderToken",""" +
        s""""acquired_ms":${System.currentTimeMillis()}}""").getBytes(UTF_8))
    finally out.close()
    try f
    finally {
      // a token MISMATCH is the only positive takeover signal. A missing
      // file means the lease is gone (nothing to release); any other read
      // failure on a healthy lease is retried once, then defaults to
      // releasing — the write above succeeded under this holder, and
      // leaving the lock in place on a transient read hiccup would block
      // every subsequent writer until staleMs with no live holder.
      def readIsOurs(): Boolean = {
        val in = fs.open(lp)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        txt.contains(holderToken)
      }
      val stillOurs =
        try readIsOurs()
        catch {
          case _: java.io.FileNotFoundException => false // gone: nothing to release
          case _: java.io.IOException =>
            try readIsOurs()
            catch {
              case _: java.io.FileNotFoundException => false
              case _: java.io.IOException => true // transient reads; release anyway
            }
        }
      if (stillOurs) fs.delete(lp, false)
      else System.err.println(
        s"[state-lock] lease at ${lockPath(stateDir)} is no longer ours " +
          "(taken over as stale during a long epoch); leaving it in place — " +
          "check for overlapping writers and raise staleMs above the epoch time")
    }
  }

  /** One incremental epoch: fingerprint only never-seen urls and append.
    *
    * @return (numNewSignatures, numQuarantined)
    */
  def runEpoch(spark: SparkSession, pages: DataFrame, idCol: String, textCol: String,
               stateDir: String, cfg: DedupConfig = DedupConfig()): (Long, Long) =
    withStateLock(spark, stateDir) {
      runEpochUnlocked(spark, pages, idCol, textCol, stateDir, cfg)
    }

  private def runEpochUnlocked(spark: SparkSession, pages: DataFrame, idCol: String,
                               textCol: String, stateDir: String,
                               cfg: DedupConfig): (Long, Long) = {
    val epochT0 = System.nanoTime()
    val (stateFs, stateRoot) = fsFor(spark, stateDir)
    stateFs.mkdirs(stateRoot)
    val sigPath = signaturesPath(stateDir)
    val qPath = quarantinePath(stateDir)

    // resume primitive (J1): anti-join against persisted state + skip list.
    // force_rescan (reference config.rs:81 / reinitialise semantics) bypasses
    // both filters and OVERWRITES state instead of appending duplicates.
    val seen =
      if (cfg.forceRescan || !exists(spark, sigPath)) None
      else Some(readSignatures(spark, stateDir))
    val quarantined = if (cfg.forceRescan) None else readIfExists(spark, qPath)
    // slice-keyed prune (cfg.stateBloomFpp): the state side of the
    // resume anti-join is the corpus-aged one; a Bloom sketch of the
    // incoming slice's ids (one slim aggregation over the pruned id
    // column — never the text) filters it to ~|slice| rows before
    // the join. Byte-identical result at any fpp (SlicePrune doc). The
    // handle is kept so the epoch can unpersist the executor-side blocks
    // once its writes are committed — a long-lived driver looping epochs
    // must not accumulate one pinned sketch per epoch.
    // PRECONDITION: `pages` must evaluate deterministically — the sketch
    // is one evaluation, the anti-join another, and an id present in the
    // second but absent from the first would prune its state row and
    // re-append a seen doc. The resumable-epoch contract already demands
    // this (a re-run must see the same slice); an upstream unordered
    // limit()/sample would violate both.
    val sliceSketch =
      if (seen.isDefined && cfg.stateBloomFpp > 0)
        Some(SlicePrune.keySketch(pages.select(col(idCol)), idCol,
          cfg.stateBloomExpected, cfg.stateBloomFpp))
      else None
    val unseen0 = seen match {
      case Some(s) =>
        val stateKeys = s.select(col("id").as(idCol))
        val joinKeys = sliceSketch match {
          case Some(bf) => stateKeys.filter(SlicePrune.mightContain(bf, col(idCol)))
          case None     => stateKeys
        }
        pages.join(joinKeys, Seq(idCol), "left_anti")
      case None    => pages
    }
    val unseen = quarantined match {
      case Some(q) => unseen0.join(q.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      case None    => unseen0
    }

    // quarantine: rows whose text is unusable (≙ per-item timeout skip list);
    // extraction upstream never throws, it degrades to empty text
    val bad = unseen.filter(col(textCol).isNull || length(col(textCol)) === 0)
      .select(col(idCol).as("id"), lit("empty_or_null_text").as("reason"),
        current_timestamp().as("quarantined_at"))
    val good = unseen.filter(col(textCol).isNotNull && length(col(textCol)) > 0)

    // order_len is persisted with the signature so representative selection
    // on resume never needs the text again
    val sigs = DedupPipeline.signatures(
      good.withColumn("order_len", length(col(textCol))),
      idCol, textCol, cfg, carry = Seq("order_len"))
      .observe("sig_metrics", count(lit(1)).as("n_rows"))

    // per-partition lineage (north_rule): which partition produced how many
    // signature rows in which epoch — epoch is stamped on every row, so the
    // state table itself carries its commit history (≙ Iceberg snapshot id)
    val epoch = nextEpoch(spark, stateDir)
    val withPart = sigs
      .withColumn("part_id", spark_partition_id())
      .withColumn("epoch", lit(epoch))
    // Layout is sticky: once a state dir exists, later epochs follow its
    // recorded layout regardless of the caller's config (mixing layouts in
    // one table would corrupt the bucket invariant); forceRescan (which
    // overwrites) is the documented way to re-layout.
    val hadState = exists(spark, sigPath)
    val buckets =
      if (!cfg.forceRescan && hadState) signatureBuckets(spark, stateDir)
      else cfg.stateBuckets
    if (buckets != cfg.stateBuckets && cfg.stateBuckets > 0)
      System.err.println(s"[state] stateBuckets=${cfg.stateBuckets} requested but " +
        s"existing layout has $buckets bucket(s); keeping the existing layout " +
        "(use forceRescan to re-layout)")
    val writeMode = if (cfg.forceRescan) "overwrite" else "append"
    if (cfg.forceRescan) {
      // a rescan restarts the STORE, so every table DERIVED from the old
      // signatures is stale the moment the overwrite lands: a later delta
      // clusterEpoch would read the pre-rescan clusters as trusted
      // connectivity (splicing edges for docs whose text changed, silently
      // splitting survivors whose cluster_id vanished), and the band index
      // would keep pre-rescan rows forever (compaction prunes only
      // tombstoned ids — vanished-by-overwrite ids are never tombstoned).
      // Dropping them forces the full path + an index rebuild next epoch.
      // The executed table goes too: it is keyed by — and physically
      // bucketed like — the OLD store, so keeping it would (a) apply
      // pre-rescan tombstones to ids the rescan re-mints and (b) leave
      // old-layout files under the re-written _layout.json, making a later
      // ensureBucketedTable register the WRONG bucket count over them —
      // the tombstone anti-join would then elide an exchange it needs and
      // silently resurrect removed docs. Same for the quarantine skip
      // list: a restarted store re-evaluates every doc from scratch.
      Seq(clustersPath(stateDir), actionsPath(stateDir), previewsPath(stateDir),
        bandsPath(stateDir), bandsMarkerPath(stateDir),
        executedPath(stateDir), qPath).foreach { p =>
        val (dfs, dp) = fsFor(spark, p)
        if (dfs.exists(dp)) dfs.delete(dp, true)
      }
      spark.sql(s"DROP TABLE IF EXISTS ${execTableName(spark, stateDir)}")
    }
    if (buckets > 0) {
      if (cfg.forceRescan)
        spark.sql(s"DROP TABLE IF EXISTS ${sigTableName(spark, stateDir)}")
      // one writer task per bucket: without the repartition every task
      // writes up to `buckets` files (tasks × buckets small files)
      withPart.repartition(buckets, col("id"))
        .write.mode(writeMode).format("parquet")
        .bucketBy(buckets, "id").sortBy("id")
        .option("path", sigPath)
        .saveAsTable(sigTableName(spark, stateDir))
    } else {
      withPart.write.mode(writeMode).parquet(sigPath)
    }
    if (!hadState || cfg.forceRescan) writeLayout(spark, stateDir, buckets)

    // quarantine count rides the write as an observe metric — one action,
    // no cache/count/write triple (an empty append just writes a footer)
    val qObs = org.apache.spark.sql.Observation()
    bad.observe(qObs, count(lit(1)).as("n")).write.mode("append").parquet(qPath)
    val nQuarantined = observedLong(qObs, 0)

    // both consumers of the pruned anti-join (signature + quarantine
    // writes) have committed; release the sketch's executor blocks now.
    // unpersist (not destroy) keeps the driver copy, so a recompute after
    // executor loss just re-fetches — correctness is unaffected.
    sliceSketch.foreach(_.unpersist())

    // one read-back pass over the committed epoch serves the lineage table
    // AND the row count: the total rides the lineage write as an observe
    // metric (sum over the already-grouped per-partition counts)
    val lObs = org.apache.spark.sql.Observation()
    val lineage = readSignatures(spark, stateDir).filter(col("epoch") === epoch)
      .groupBy("part_id")
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("epoch", lit(epoch))
      .withColumn("table", lit("signatures"))
      .observe(lObs, coalesce(sum("n_rows"), lit(0L)).as("n"))
    lineage.write.mode("append").parquet(metricsPath(stateDir))

    // X13 rate metrics (reference progress.rs ETA math): each commit line
    // records its own throughput, so an operator can project the remaining
    // corpus (eta = remaining / docs_per_sec) from the manifest alone
    val nNew = observedLong(lObs, 0)
    val elapsed = (System.nanoTime() - epochT0) / 1e9
    val rate = if (elapsed > 0) nNew / elapsed else 0.0
    // explicit ROOT locale: the manifest is machine-parsed JSON and this is
    // library code — a comma-decimal host locale must not leak into it
    appendManifest(spark, stateDir,
      s"""{"epoch":$epoch,"new_signatures":$nNew,"quarantined":$nQuarantined,""" +
        s""""elapsed_sec":${"%.2f".formatLocal(java.util.Locale.ROOT, elapsed)},""" +
        s""""docs_per_sec":${"%.1f".formatLocal(java.util.Locale.ROOT, rate)}}""")
    (nNew, nQuarantined)
  }

  /** Full incremental epoch: fingerprint new pages ([[runEpoch]]), then
    * re-cluster from the PERSISTED signature state (fingerprints are never
    * recomputed — clustering alone is re-derived, which is the cheap part)
    * and overwrite the clusters + actions tables. The suffix-array verify
    * pass fetches normalized text for its ambiguous slice from `textsOf`
    * when given, else from `pages`.
    *
    * SLICE-FED posture (the 10^12-doc operating mode): pass only the crawl
    * slice as `pages` — the anti-join, extraction and fingerprinting then
    * cost O(slice), not O(corpus) — and the authoritative pages table
    * (e.g. the full lazily-scanned catalog table) as `textsOf`, so the
    * verify pass can still fetch text for FRONTIER docs from earlier
    * epochs (a new page's near-mates are old pages whose text is not in
    * the slice). Under `deltaCluster` the fetch prunes that table to the
    * frontier before any shuffle, so feeding the full table costs one
    * column scan, never a corpus shuffle. Without `textsOf`, old-doc
    * text is simply absent and ambiguous pairs with a missing side fall
    * back to the shingle-containment decision (documented in
    * [[DedupPipeline.nearEdges]]) — convergent, but not bit-identical to
    * the full-fed epoch; DeltaClusterSpec pins that the textsOf route IS
    * bit-identical.
    *
    * @return (numNewSignatures, numClusters)
    */
  def clusterEpoch(spark: SparkSession, pages: DataFrame, idCol: String, textCol: String,
                   stateDir: String, cfg: DedupConfig = DedupConfig(),
                   action: String = "symlink",
                   textsOf: Option[DataFrame] = None): (Long, Long) =
      withStateLock(spark, stateDir) {
    // reliable-checkpoint mode defaults its dir to live beside the state
    // tables — same filesystem, one tree to clean up
    val cfg0 =
      if (cfg.reliableCheckpoints && cfg.checkpointDir.isEmpty)
        cfg.copy(checkpointDir = s"$stateDir/_spark_checkpoints")
      else cfg
    val (nNew, _) = runEpochUnlocked(spark, pages, idCol, textCol, stateDir, cfg0)

    // cluster the LIVE state: rows vacated by executed delete/move actions
    // must not re-enter clusters (or worse, win representative selection
    // and direct new duplicates at originals that no longer exist)
    val stateSigs = liveSignatures(spark, stateDir)
    val texts =
      DedupPipeline.normTexts(textsOf.getOrElse(pages), idCol, textCol, cfg0)
    // delta-incremental clustering (cfg.deltaCluster): re-derive near
    // edges only for the re-verify frontier — this epoch's new docs plus
    // members of clusters invalidated by executed removals (a removal can
    // sever the only path connecting surviving members, so those clusters
    // cannot trust their old assignment edges) — and splice the stable
    // clusters' connectivity in as assignment edges. Falls back to the
    // full re-cluster on the first epoch or under forceRescan.
    val clusters =
      if (cfg0.deltaCluster && !cfg0.forceRescan &&
          exists(spark, clustersPath(stateDir))) {
        val prior = spark.read.parquet(clustersPath(stateDir))
        // "new" = every live doc the prior clusters table has never seen —
        // NOT just the epoch runEpoch committed above: signature epochs
        // accrue WITHOUT clustering under the streaming-ingest cadence and
        // under repeated runEpoch calls, and an epoch filter would silently
        // skip those docs' near-pair discovery (they are absent from the
        // assignment edges too, so nothing else re-derives them; pinned by
        // the accrued-epochs DeltaClusterSpec case). One slim id-column
        // anti-join per epoch — corpus-sized but 2 columns wide.
        val newSids = stateSigs.select(col("id").as("sid"))
          .join(prior.select(col("id").as("sid")), Seq("sid"), "left_anti")
        val tombs = tombstones(spark, stateDir).select("id")
        val affected = prior.join(tombs, Seq("id"), "left_semi")
          .select("cluster_id").distinct()
        val liveMembers = prior.join(tombs, Seq("id"), "left_anti")
        val invalidated = liveMembers
          .join(affected, Seq("cluster_id"), "left_semi")
          .select(col("id").as("sid"))
        val stable = liveMembers.join(affected, Seq("cluster_id"), "left_anti")
        val focus = newSids.union(invalidated).distinct()
        val assigns = stable.filter(col("id") =!= col("cluster_id"))
          .select(col("id").as("sid_a"), col("cluster_id").as("sid_b"))
        DedupPipeline.clusterSignaturesDelta(
          spark, stateSigs, focus, assigns, Some(texts), cfg0,
          bandIndex = Some(ensureBandIndex(spark, stateDir, cfg0)))
      } else {
        // keep the index warm on full/first epochs too (when the flag is
        // set): the NEXT delta epoch then starts from a delta-sized append
        // instead of a corpus-wide bootstrap pass
        if (cfg0.deltaCluster && !cfg0.forceRescan)
          ensureBandIndex(spark, stateDir, cfg0)
        DedupPipeline.clusterSignatures(spark, stateSigs, Some(texts), cfg0)
      }

    clusters.write.mode("overwrite").parquet(clustersPath(stateDir))
    graft.actions.Actions.plan(clusters, action, dryRun = true)
      .write.mode("overwrite").parquet(actionsPath(stateDir))

    // preview surface (reference generate_thumbnails, config.rs:54,106):
    // one snippet row per cluster, from its representative's normalized
    // text — clusters is eagerly checkpointed, so this join reads
    // materialized rows, and the texts side is the already-built normTexts
    // projection (capped at saMaxChars upstream)
    if (cfg0.previewChars <= 0) {
      // previews are per-epoch: a table left by a prior opt-in run would
      // reference cluster_ids from an older epoch while clusters/ is fresh —
      // remove it rather than serve a stale-but-current-looking surface
      // (<= 0, not == 0: a library caller's negative value must not skip
      // BOTH the write and this cleanup)
      val (fs, pv) = fsFor(spark, previewsPath(stateDir))
      if (fs.exists(pv)) fs.delete(pv, true)
    } else {
      // LEFT join: under the slice-fed posture without textsOf, `texts`
      // covers only this epoch's slice — an inner join would silently
      // shrink the table to the few clusters whose representative is new,
      // while the contract is one row per cluster (preview null when the
      // representative's text was not among this epoch's inputs). The
      // substring projects BEFORE the join so the exchange ships
      // previewChars per row, not the full saMaxChars norm_text.
      clusters.filter(col("is_representative"))
        .select(col("cluster_id"), col("id"))
        .join(texts.select(col("id"),
          substring(col("norm_text"), 1, cfg0.previewChars).as("preview")),
          Seq("id"), "left")
        .select(col("cluster_id"), col("id").as("representative_id"),
          col("preview"))
        .write.mode("overwrite").parquet(previewsPath(stateDir))
    }

    val epoch = nextEpoch(spark, stateDir) - 1 // runEpoch already appended this epoch
    val persisted = spark.read.parquet(clustersPath(stateDir))
    // cluster count rides the lineage write as an observe metric: every
    // cluster has exactly one representative (pipeline invariant, oracled
    // per-row by q_dedup_invariants), so sum(is_representative) ≡
    // count(distinct cluster_id) without a second scan + distinct exchange
    val cObs = org.apache.spark.sql.Observation()
    val lineage = persisted
      .observe(cObs, coalesce(sum(col("is_representative").cast("long")), lit(0L))
        .as("n_clusters"))
      .withColumn("part_id", spark_partition_id())
      .groupBy("part_id").agg(count(lit(1)).as("n_rows"))
      .withColumn("epoch", lit(epoch))
      .withColumn("table", lit("clusters"))
    lineage.write.mode("append").parquet(metricsPath(stateDir))

    val nClusters = observedLong(cObs, 0)
    appendManifest(spark, stateDir, s"""{"epoch":$epoch,"clusters":$nClusters}""")
    (nNew, nClusters)
  }

  /** Execute the planned actions table against the live signature state —
    * the reference's final pipeline stage, which it specifies but stubs
    * (`action.rs:1`, CLI contract `cli.rs:27-37`, README.md:26-42):
    *
    *  - idempotent with bounded retries: a plan row is attempted at most
    *    once per PLAN IDENTITY (id, original_id, action) — the anti-join on
    *    the persisted `executed` table skips rows already SETTLED: succeeded,
    *    or failed PERMANENTLY (a validation failure — `missing_id`/
    *    `missing_original` — is deterministic in the state, so re-running it
    *    unchanged would only accumulate duplicate failure rows). A failure
    *    with any OTHER error class (a transient infrastructure fault from a
    *    side-effecting executor) stays pending and is retried on the next
    *    run. Re-clustering that assigns a failed duplicate a NEW original
    *    emits a new plan identity, which runs — retry-on-replan for
    *    validation failures, retry-on-rerun for transient ones;
    *  - validate-exists: both sides of every action must still be live
    *    signature ids, else success=false with an error reason;
    *  - backup-before-remove (`config.rs:57` backup_dir): the signature
    *    rows a successful delete/move will vacate are appended to
    *    `backupDir` BEFORE the commit (a crash in between re-appends the
    *    backup on retry — duplicate safety copies, never missing ones);
    *  - ATOMIC commit: the `executed` append is the SINGLE commit point.
    *    Tombstones are DERIVED from it on read ([[tombstones]] /
    *    [[liveSignatures]]), so there is no second table whose partial
    *    write could desynchronize the store (the reference analog is one
    *    RocksDB write batch, `db.rs:64-92`).
    *
    * @return (nExecuted, nFailed) for this run (0, 0) when nothing pending
    */
  def executeEpoch(spark: SparkSession, stateDir: String,
                   backupDir: Option[String] = None,
                   cfg: DedupConfig = DedupConfig()): (Long, Long) =
      withStateLock(spark, stateDir) {
    val cfg0 =
      if (cfg.reliableCheckpoints && cfg.checkpointDir.isEmpty)
        cfg.copy(checkpointDir = s"$stateDir/_spark_checkpoints")
      else cfg
    val plan = spark.read.parquet(actionsPath(stateDir))
    val pending = readExecuted(spark, stateDir) match {
      case Some(prior) =>
        val settled = prior.filter(col("success") ||
          col("error").isin("missing_id", "missing_original"))
        // NULL-SAFE key compare: plan rows for clusters with no
        // representative carry original_id = null (Actions.plan surfaces
        // them as error rows), and a plain equi-join's null = null is
        // never true — such a row would count as forever-pending and
        // append a fresh failure row on EVERY run, violating the
        // at-most-once-per-plan-identity contract
        val s = settled.select(col("id").as("s_id"),
          col("original_id").as("s_orig"), col("action").as("s_action"))
        plan.join(s,
          col("id") <=> col("s_id") && col("original_id") <=> col("s_orig") &&
            col("action") <=> col("s_action"),
          "left_anti")
      case None => plan
    }
    // validate against the LIVE view: a signature row vacated by an earlier
    // executed delete/move must not validate as an existing original/dup.
    // Materialized ONCE: execute() probes it from two join branches (dup +
    // original) — left lazy, the whole live-state derivation (parquet scan
    // + tombstone anti-join + distinct) would evaluate per branch
    val universe = cfg0.materializer(spark)(
      liveSignatures(spark, stateDir).select("id").distinct())
    // small table (one row per planned duplicate): materialize once, every
    // consumer below (backup, commit, counts) reads the checkpoint — via the
    // CONFIGURED materializer, so `--reliable` covers the executor stage too
    // (a preemption mid-execute recomputes from checkpoint files instead of
    // wasting the epoch). Stamped with the manifest epoch it ran under so
    // [[signaturesAsOf]] can scope tombstones per snapshot.
    val executed = cfg0.materializer(spark)(
      graft.actions.Actions.execute(pending, universe)
        .withColumn("epoch", lit(math.max(0L, nextEpoch(spark, stateDir) - 1))))

    backupDir.foreach { bd =>
      readSignatures(spark, stateDir)
        .join(graft.actions.Actions.tombstones(executed).select("id"), Seq("id"), "left_semi")
        .write.mode("append").parquet(bd)
    }
    // one aggregation pass over the checkpointed result serves both counts
    val r = executed.agg(
      coalesce(sum(when(col("success"), 1L).otherwise(0L)), lit(0L)),
      count(lit(1))).first()
    val nExecuted = r.getLong(0)
    val nFailed = r.getLong(1) - nExecuted
    if (nExecuted + nFailed > 0) {
      val b = signatureBuckets(spark, stateDir)
      if (b > 0)
        // the executed table follows the store's bucket layout (see
        // [[readExecuted]]); one writer task per bucket, same as signatures
        executed.repartition(b, col("id"))
          .write.mode("append").format("parquet")
          .bucketBy(b, "id").sortBy("id")
          .option("path", executedPath(stateDir))
          .saveAsTable(execTableName(spark, stateDir))
      else executed.write.mode("append").parquet(executedPath(stateDir))
    }
    appendManifest(spark, stateDir,
      s"""{"executed":$nExecuted,"failed":$nFailed}""")
    (nExecuted, nFailed)
  }

  /** Tombstoned rows, derived on read from the executed table (successful
    * delete/move actions vacate their row). Derivation — not a second
    * persisted table — is what makes [[executeEpoch]]'s commit atomic.
    */
  def tombstones(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    readExecuted(spark, stateDir)
      .map(graft.actions.Actions.tombstones)
      .getOrElse(Seq.empty[(String, String, String)].toDF("id", "original_id", "action"))
  }

  /** The live signature state: persisted signatures minus tombstoned rows. */
  def liveSignatures(spark: SparkSession, stateDir: String): DataFrame = {
    val sigs = readSignatures(spark, stateDir)
    readExecuted(spark, stateDir) match {
      case Some(ex) =>
        sigs.join(graft.actions.Actions.tombstones(ex).select("id"), Seq("id"), "left_anti")
      case None => sigs
    }
  }

  /** The dedup verdict as an id set — what a training export keeps: cluster
    * representatives (every clustered doc is in exactly one cluster with
    * exactly one representative — singletons represent themselves — so the
    * non-representative rows ARE the planned duplicates) minus tombstoned
    * rows. None when the state has no clusters table yet (no epoch has
    * run); callers then export the corpus unfiltered.
    */
  def keepIds(spark: SparkSession, stateDir: String): Option[DataFrame] =
    readIfExists(spark, clustersPath(stateDir)).map { c =>
      val reps = c.filter(col("is_representative")).select("id")
      readExecuted(spark, stateDir) match {
        case Some(ex) => reps.join(
          graft.actions.Actions.tombstones(ex).select("id"), Seq("id"), "left_anti")
        case None => reps
      }
    }

  // ------------------------------------------------------------------
  // Persisted band index — the delta-cluster frontier's slim lookup table.
  //
  // (id, band, band_hash) for every discovery channel of every persisted
  // signature (~tens of bytes/row vs the KB-scale shingle arrays they
  // derive from). Without it, every delta epoch re-winnows every doc's
  // shingle array just to FIND the frontier — measured 10.5 s of the
  // 42 s delta epoch at the 220k tier, erasing the mode's win; with it,
  // frontier selection is a slim scan + broadcast semi-join. The index is
  // maintained append-only per epoch and is a pure function of the
  // signatures table + the channel knobs, so it can always be rebuilt.
  // ------------------------------------------------------------------

  /** The channel-shape knobs the index rows depend on; a mismatch with a
    * later run's config invalidates the index (it is rebuilt, same cadence
    * discipline as delta clustering itself after knob changes).
    */
  private def channelKnobsJson(cfg: DedupConfig): String =
    s"""{"bands":${cfg.bands},"rows_per_band":${cfg.rowsPerBand},""" +
      s""""prefix_band_shingles":${cfg.prefixBandShingles},""" +
      // structural version of the prefix channel (two-level ladder):
      // bumping it invalidates pre-ladder indexes so they rebuild with
      // the new level rows instead of silently missing half the buckets
      s""""prefix_band_levels":2,""" +
      s""""anchor_modulus":${cfg.anchorModulus},""" +
      s""""fast_path_bands":${cfg.fastPathBands}}"""

  /** Band index covering every committed epoch, building or repairing as
    * needed; returns the index frame (id, band, band_hash).
    *
    *  - no marker / knob mismatch → full rebuild from the signatures table
    *    (bootstrap, or the documented post-knob-change full pass);
    *  - marker behind the epoch counter (an interleaved non-delta epoch, or
    *    a crash between the signature commit and the index append) → append
    *    just the missing epochs' rows. The repair is idempotent: a replayed
    *    append only duplicates rows, and every consumer is a semi-join.
    *
    * Tombstoned docs keep their index rows (they only widen the frontier;
    * live-state semi-joins drop them downstream) — [[compactSignatures]]
    * prunes them during maintenance. The marker is written AFTER the data,
    * so a crash can only leave the index behind, never ahead.
    */
  def ensureBandIndex(spark: SparkSession, stateDir: String,
                      cfg: DedupConfig): DataFrame = {
    val lastEpoch = nextEpoch(spark, stateDir) - 1
    val knobs = channelKnobsJson(cfg)
    val (fs, mp) = fsFor(spark, bandsMarkerPath(stateDir))
    val marker: Option[(String, Long)] =
      if (!fs.exists(mp)) None
      else {
        val in = fs.open(mp)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        for {
          k <- """"knobs":(\{[^}]*\})""".r.findFirstMatchIn(txt).map(_.group(1))
          e <- """"through_epoch":(-?\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
        } yield (k, e)
      }
    def rows(sigs: DataFrame) =
      DedupPipeline.allChannelBandRows(sigs, cfg, includeFast = true)
    def writeMarker(): Unit = {
      val out = fs.create(mp, true)
      try out.write(
        s"""{"knobs":$knobs,"through_epoch":$lastEpoch}""".getBytes(UTF_8))
      finally out.close()
    }
    marker match {
      case Some((k, through)) if k == knobs && through >= lastEpoch => ()
      case Some((k, through)) if k == knobs =>
        rows(readSignatures(spark, stateDir).filter(col("epoch") > through))
          .write.mode("append").parquet(bandsPath(stateDir))
        writeMarker()
      case _ =>
        rows(readSignatures(spark, stateDir))
          .write.mode("overwrite").parquet(bandsPath(stateDir))
        writeMarker()
    }
    spark.read.parquet(bandsPath(stateDir))
  }

  /** SNAPSHOT read — the signature state exactly as of `epoch`, inclusive
    * (Iceberg-style time travel over the epoch manifest, which is this
    * store's snapshot log: every row carries the epoch that committed it,
    * and executed actions are stamped with the epoch they ran under).
    * Signature commits after the epoch are invisible; only tombstones from
    * executions at or before it apply. `signaturesAsOf(latest epoch)` ≡
    * [[liveSignatures]].
    */
  def signaturesAsOf(spark: SparkSession, stateDir: String, epoch: Long): DataFrame = {
    val sigs = readSignatures(spark, stateDir)
      .filter(col("epoch") <= epoch)
    if (exists(spark, executedPath(stateDir))) {
      // mergeSchema (plain layout): a store whose executed table mixes
      // pre-time-travel files (no epoch column) with epoch-stamped appends
      // must see the union schema deterministically — and un-stamped rows
      // must count as epoch 0 (all-history), not NULL (filtered out, which
      // would silently resurrect their tombstoned rows in every snapshot).
      // Bucketed stores postdate time travel (every executed row is
      // epoch-stamped), so the catalog read suffices there.
      val ex =
        if (signatureBuckets(spark, stateDir) > 0)
          readExecuted(spark, stateDir).get
        else spark.read.option("mergeSchema", "true")
          .parquet(executedPath(stateDir))
      val inScope =
        if (ex.columns.contains("epoch"))
          ex.filter(coalesce(col("epoch"), lit(0L)) <= epoch)
        else ex // pre-time-travel executed table: all tombstones apply
      sigs.join(graft.actions.Actions.tombstones(inScope).select("id"),
        Seq("id"), "left_anti")
    } else sigs
  }

  /** State consistency diagnosis — the runnable analog of the reference's
    * `diagnose_database` user command (`src/persistence/db.rs:213-278`,
    * which counts crypto-only / perceptual-only half-rows). The one-row
    * twin-column design makes half-rows impossible, so the checks that
    * remain meaningful here are CROSS-TABLE, and they must respect epoch
    * staleness: clusterEpoch clusters the LIVE view, so a signature row is
    * "unclustered" drift only if it is LIVE and absent from clusters (a
    * tombstoned row legitimately drops out of the next clusters table);
    * conversely a cluster id is "dangling" only if it never had a signature
    * AT ALL (tombstoned ids still exist in the raw table). Output:
    * (category, n) — both drift categories are zero on a healthy store at
    * any point in the runEpoch/clusterEpoch/executeEpoch cycle.
    */
  def diagnose(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    val empty = spark.emptyDataset[String].toDF("id")
    val sigs =
      if (exists(spark, signaturesPath(stateDir)))
        readSignatures(spark, stateDir).select("id")
      else empty
    val live =
      if (exists(spark, signaturesPath(stateDir)))
        liveSignatures(spark, stateDir).select("id")
      else empty
    val clusters = readIfExists(spark, clustersPath(stateDir))
      .map(_.select("id")).getOrElse(empty)
    val quarantined = readIfExists(spark, quarantinePath(stateDir))
      .map(_.select("id")).getOrElse(empty)
    // ONE pass: union every per-table id stream (including the two
    // anti-join drift streams) under a category label and aggregate — the
    // same observe-fusion discipline as the epoch paths, instead of seven
    // separate count() round-trips. Zero-count categories are restored by
    // the seed join so a healthy store still reports every row.
    def tag(df: DataFrame, cat: String) = df.select(lit(cat).as("category"))
    val counted = tag(sigs, "signatures")
      .unionAll(tag(live, "live_signatures"))
      .unionAll(tag(clusters, "clusters"))
      .unionAll(tag(quarantined, "quarantined"))
      .unionAll(tag(tombstones(spark, stateDir), "tombstoned"))
      .unionAll(tag(live.join(clusters, Seq("id"), "left_anti"),
        "signature_without_cluster"))
      .unionAll(tag(clusters.join(sigs, Seq("id"), "left_anti"),
        "cluster_without_signature"))
      .groupBy("category").agg(count(lit(1)).as("n"))
    Seq("signatures", "live_signatures", "clusters", "quarantined",
      "tombstoned", "signature_without_cluster", "cluster_without_signature")
      .toDF("category")
      .join(counted, Seq("category"), "left")
      .select(col("category"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Compact the id-keyed state tables (signatures + executed, when
    * present) back to their minimal file count — the maintenance half of
    * an append-only store's lifecycle (≙ Iceberg rewrite_data_files;
    * reference flush/compact cadence, lib.rs:178-223). A nightly-epoch
    * store accrues one file per bucket (bucketed layout) or per task
    * (plain) PER EPOCH AND TABLE; after a year the per-bucket file
    * count — open() round-trips and footer reads, not data volume —
    * dominates scan planning on an object store. The rewrite preserves
    * every row including the `epoch` column, so [[signaturesAsOf]] time
    * travel is unaffected, and keeps the recorded layout (bucketed stays
    * bucketed on the same N).
    *
    * Crash-safe swap: the rewrite lands in a sibling temp dir, the live
    * dir renames to `.old`, the temp renames into place, then `.old` is
    * deleted — a crash leaves either the old or the new table readable at
    * the live path (plus at most a stale temp/`.old` that the next
    * compact removes). Runs under the writer lease.
    *
    * @return (filesBefore, filesAfter)
    */
  def compactSignatures(spark: SparkSession, stateDir: String): (Long, Long) =
    withStateLock(spark, stateDir) {
      require(exists(spark, signaturesPath(stateDir)),
        s"no signatures table at ${signaturesPath(stateDir)}")
      val buckets = signatureBuckets(spark, stateDir)

      def compactOne(path: String, read: => DataFrame, tmpTbl: String,
                     refresh: => Unit, tableBuckets: Int): (Long, Long) = {
        val (fs, live) = fsFor(spark, path)
        val tmp = new Path(path + ".compact.tmp")
        val old = new Path(path + ".compact.old")
        // leftovers from a crashed prior compact: the live path is
        // authoritative, both siblings are safe to drop
        if (fs.exists(tmp)) fs.delete(tmp, true)
        if (fs.exists(old)) fs.delete(old, true)

        def countFiles(p: Path): Long = {
          val it = fs.listFiles(p, true)
          var n = 0L
          while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
          n
        }
        val before = countFiles(live)

        if (tableBuckets > 0) {
          // SHUFFLE-FREE rewrite: force the bucketed scan on (the
          // DisableUnnecessaryBucketedScan planner rule only credits joins/
          // aggregates, not V1 writes — left to its default it re-reads the
          // table as size-based splits that MIX buckets, and each write task
          // then emits one file per bucket present: measured 19 files for 8
          // buckets instead of 8). With the bucketed scan pinned, each task
          // reads exactly one bucket's files and rewrites them as one file —
          // zero exchange; the repartition below is elided as redundant and
          // stands only as the correctness net if the scan loses its
          // partitioning.
          val autoBucketedKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
          val prevAuto = spark.conf.get(autoBucketedKey)
          spark.sql(s"DROP TABLE IF EXISTS $tmpTbl")
          try {
            spark.conf.set(autoBucketedKey, "false")
            read
              .repartition(tableBuckets, col("id"))
              .write.mode("overwrite").format("parquet")
              .bucketBy(tableBuckets, "id").sortBy("id")
              .option("path", tmp.toString)
              .saveAsTable(tmpTbl)
          } finally spark.conf.set(autoBucketedKey, prevAuto)
          spark.sql(s"DROP TABLE IF EXISTS $tmpTbl")
        } else {
          // plain layout: pack to ~128 MB files (object-store-friendly)
          val bytes = fs.getContentSummary(live).getLength
          val parts = math.max(1L, bytes / (128L << 20)).toInt
          read.repartition(parts)
            .write.mode("overwrite").parquet(tmp.toString)
        }

        if (!fs.rename(live, old))
          throw new java.io.IOException(s"compact swap failed: rename $live -> $old")
        if (!fs.rename(tmp, live)) {
          fs.rename(old, live) // roll back; the rewrite is abandoned
          throw new java.io.IOException(s"compact swap failed: rename $tmp -> $live")
        }
        fs.delete(old, true)
        val after = countFiles(live)
        if (tableBuckets > 0) refresh
        (before, after)
      }

      val (sb, sa) = compactOne(signaturesPath(stateDir),
        readSignatures(spark, stateDir),
        sigTableName(spark, stateDir) + "_compact",
        ensureSigTable(spark, stateDir, buckets), buckets)
      // the executed table accrues files the same way (one per bucket per
      // executed epoch) and is read by every liveSignatures call
      val (eb, ea) =
        if (exists(spark, executedPath(stateDir)))
          compactOne(executedPath(stateDir),
            readExecuted(spark, stateDir).get,
            execTableName(spark, stateDir) + "_compact",
            ensureBucketedTable(spark, execTableName(spark, stateDir),
              executedPath(stateDir), buckets), buckets)
        else (0L, 0L)
      // the band index accrues files per epoch too, and keeps rows for
      // tombstoned docs (they only widen the delta frontier): maintenance
      // prunes both. Plain-parquet rewrite — the index is a semi-join-only
      // surface, so no layout to preserve.
      val (ib, ia) =
        if (exists(spark, bandsPath(stateDir)))
          compactOne(bandsPath(stateDir),
            spark.read.parquet(bandsPath(stateDir)).join(
              tombstones(spark, stateDir).select("id"), Seq("id"), "left_anti"),
            "unused_bands_compact", (), 0)
        else (0L, 0L)

      // no "new_signatures" key: compaction must not advance the epoch
      // counter (nextEpoch counts signature-commit lines only)
      appendManifest(spark, stateDir,
        s"""{"compacted":"signatures+executed+bands","files_before":${sb + eb + ib},""" +
          s""""files_after":${sa + ea + ia}}""")
      (sb + eb + ib, sa + ea + ia)
    }

  /** Manifest lines, oldest first; empty if no manifest yet. Falls back to
    * the `.bak` copy if a crash interrupted a commit between its two
    * renames (see [[appendManifest]]) — at most the crashed commit's own
    * line is lost, never the history.
    */
  def readManifest(spark: SparkSession, stateDir: String): Seq[String] = {
    val (fs, p) = fsFor(spark, manifestPath(stateDir))
    val src =
      if (fs.exists(p)) p
      else {
        val bak = new Path(manifestPath(stateDir) + ".bak")
        if (fs.exists(bak)) bak else return Nil
      }
    val in = fs.open(src)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
  }

  private[state] def nextEpoch(spark: SparkSession, stateDir: String): Long =
    // only signature-commit lines advance the epoch counter (clusterEpoch
    // appends an additional clusters line per epoch)
    readManifest(spark, stateDir).count(_.contains("\"new_signatures\"")).toLong

  /** Append one manifest line via read + tmp-write + double rename — works
    * on stores with no append support (S3, local checksum FS alike); the
    * manifest is tiny (one line per commit), so the rewrite is O(commits).
    *
    * Crash safety: the previous manifest is RENAMED to `.bak` (not
    * deleted) before the new file renames into place, and [[readManifest]]
    * falls back to `.bak` — a crash in the window between the two renames
    * loses at most the line being appended, never the commit history (a
    * delete-then-rename scheme would reset the epoch counter to 0).
    */
  private def appendManifest(spark: SparkSession, stateDir: String, line: String): Unit = {
    val lines = readManifest(spark, stateDir) :+ line
    val (fs, p) = fsFor(spark, manifestPath(stateDir))
    val tmp = new Path(manifestPath(stateDir) + ".tmp")
    val bak = new Path(manifestPath(stateDir) + ".bak")
    val out = fs.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n").getBytes(UTF_8))
    finally out.close()
    if (fs.exists(p)) {
      if (fs.exists(bak)) fs.delete(bak, false)
      if (!fs.rename(p, bak))
        throw new java.io.IOException(s"manifest commit failed: rename $p -> $bak")
    }
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"manifest commit failed: rename $tmp -> $p")
  }
}
