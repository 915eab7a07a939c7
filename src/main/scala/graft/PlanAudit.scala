package graft

/** Physical-plan audit: prints `explain("formatted")` for representative
  * queries and greps the markers that matter at 100 TB — predicate pushdown
  * (`PushedFilters`), column pruning (`ReadSchema`), broadcast vs shuffle
  * join choice, and whole-stage codegen coverage. Output is reviewed into
  * PLANS.md each round. Not part of the driver contract — a tuning tool.
  */
object PlanAudit {

  private val Audited = Seq(
    "q_filter_project",  // pushdown + pruning must reach the parquet scan
    "q_anti_join",       // the resume primitive: left anti, broadcastable
    "q_star_join",       // small dim must broadcast
    "q1_agg",            // partial (map-side) aggregation must appear
    "q_exact_dedup",     // hash-agg over sha2, no collect_list
    "q_window_top1",     // single sort+window, no extra exchange
    "q_signatures",      // fingerprint stage: projection-only, codegen'd
    "q_minhash_lsh_pairs", // explode + size-join + self-join shape
    "q_mix_sample",      // A15 rate sample: filter rides the scan, no exchange
    "q_mix_truncate",    // A15 exact budget: ONE window exchange on source
    "q_mix_upsample",    // A16 up-sample: generator rides the scan, no exchange
    "q_pack_plan")       // A17 packing: ONE window exchange on shard, slim cols

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Bench.sessionFor(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    def show(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $name =====")
      try println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      catch { case e: Throwable => println(s"[audit] $name failed: $e") }
    }
    for (name <- Audited) show(name, SparkEntry.queries(name)(spark, sfDir))
    // raw ANN operator plans (their driver queries wrap them in one-row
    // invariant aggregates, which would hide the pair-shuffle shape).
    // Scale check: NO array<...> column may appear in any Exchange feeding
    // a pair join — vectors re-join after the distinct.
    // parquet schema resolution is EAGER — reads stay inside show()'s
    // by-name argument so a dataset without embeddings/documents degrades
    // to a per-section "[audit] ... failed" line instead of aborting every
    // remaining audit section
    show("ann_lsh_knn (raw operator)",
      graft.ann.Ann.lshKnn(spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", "embedding", 3))
    show("ann_neardup_lsh (raw operator)",
      graft.ann.Ann.embeddingNearDupsLsh(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", "embedding", 0.9))
    // dictionary encode: ONE range exchange; the dedup aggregate must reuse
    // the range partitioning (no second hashpartitioning exchange)
    show("id_dictionary (encode plan)",
      graft.pipeline.DedupPipeline.idDictionaryPlan(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(org.apache.spark.sql.functions.col("doc_id").cast("string"))))

    // bucketed state layout (round 5c): the resume anti-join must show ONE
    // exchange (incoming side only; state scan carries its bucketing) and
    // the live view ZERO (both id-keyed tables bucket-aligned). Audited at
    // the at-scale shape: broadcast off (a 10^12-doc state never
    // broadcasts), AQE off so the compile-time plan is the visible one.
    {
      import org.apache.spark.sql.functions.col
      val stateDir = java.nio.file.Files.createTempDirectory("plan-audit-state").toString
      val pages = graft.pages.PagesGen.pages(spark, 20L, seed = 5L, tokensPerDoc = 60).toDF()
      val cfg = graft.pipeline.DedupConfig(stateBuckets = 8)
      graft.state.Checkpoints.clusterEpoch(spark, pages, "url", "text", stateDir, cfg,
        action = "delete")
      graft.state.Checkpoints.executeEpoch(spark, stateDir, None, cfg)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      show("bucketed_resume_anti_join (one exchange, incoming side)",
        pages.join(graft.state.Checkpoints.readSignatures(spark, stateDir)
          .select(col("id").as("url")), Seq("url"), "left_anti"))
      show("bucketed_live_view (zero exchange)",
        graft.state.Checkpoints.liveSignatures(spark, stateDir))
    }
    spark.stop()
  }
}
