package graft

import org.apache.spark.sql.functions._

import graft.mix.{CorpusMix, ShardedExport}

/** A15 corpus mixing + sharded export: hash-deterministic sampling
  * (nested across rates, engine-replayable), token-budget mixing,
  * exact-budget truncation, and the deterministic shard layout with its
  * manifest. The scale contracts — rate sampling is a scan-riding filter,
  * the export is one range exchange with one file per shard — are pinned
  * as plan/layout assertions.
  */
class MixSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int) =
    spark.range(n).select(
      concat(lit("http://d"), col("id"), lit(".test/p")).as("url"),
      when(col("id") % 2 === 0, "crawl_a").otherwise("crawl_b").as("source"),
      concat(lit("word "), col("id").cast("string"),
        lit(" tail tokens here")).as("text"))

  test("rate sampling: deterministic, near-rate, and unlisted sources drop") {
    val df = corpus(2000)
    val kept = CorpusMix.sampleBySourceRates(df, "url", "source",
      Map("crawl_a" -> 0.5, "crawl_b" -> 0.1), salt = "mix-v1")
    val bySrc = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // binomial at n=1000/source: 3σ bands
    assert(math.abs(bySrc("crawl_a") - 500L) < 3 * math.sqrt(250.0))
    assert(math.abs(bySrc.getOrElse("crawl_b", 0L) - 100L) < 3 * math.sqrt(90.0))
    // bit-for-bit reproducible: same ids on a re-run over a reshuffled input
    val again = CorpusMix.sampleBySourceRates(
      df.repartition(7), "url", "source",
      Map("crawl_a" -> 0.5, "crawl_b" -> 0.1), salt = "mix-v1")
    assert(again.select("url").as[String].collect().sorted.toSeq ===
      kept.select("url").as[String].collect().sorted.toSeq)
    // a source with no listed rate is not in the mix
    val explicit = CorpusMix.sampleBySourceRates(df, "url", "source",
      Map("crawl_a" -> 1.0), salt = "mix-v1")
    assert(explicit.filter(col("source") === "crawl_b").count() === 0L)
    assert(explicit.filter(col("source") === "crawl_a").count() === 1000L)
  }

  test("samples nest: raising a rate only ADDS documents") {
    val df = corpus(1000)
    def keep(r: Double) = CorpusMix.sampleBySourceRates(
      df, "url", "source", Map("crawl_a" -> r, "crawl_b" -> r), "mix-v1")
      .select("url").as[String].collect().toSet
    val k25 = keep(0.25); val k50 = keep(0.5); val k90 = keep(0.9)
    assert(k25.subsetOf(k50) && k50.subsetOf(k90),
      "threshold sampling on one variate must produce nested mixes")
    // and a different salt decorrelates (a fresh mix, not the same subset)
    val other = CorpusMix.sampleBySourceRates(
      df, "url", "source", Map("crawl_a" -> 0.5, "crawl_b" -> 0.5), "mix-v2")
      .select("url").as[String].collect().toSet
    assert(other != k50)
  }

  test("plan: rate sampling is a scan-riding filter — no exchange, no join") {
    val plan = CorpusMix.sampleBySourceRates(corpus(100), "url", "source",
      (1 to 50).map(i => s"src$i" -> 0.5).toMap, "mix-v1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"mix sampling must stay a per-row filter:\n$plan")
  }

  test("token-budget mix: rates = min(1, budget/tokens), yield ≈ budget") {
    val df = corpus(2000) // 5 tokens per doc -> 10k tokens per source
    val (kept, stats) = CorpusMix.mixByTokenBudget(df, "url", "text",
      "source", Map("crawl_a" -> 2500L, "crawl_b" -> 50000L), "mix-v1")
    val a = stats.find(_.source == "crawl_a").get
    val b = stats.find(_.source == "crawl_b").get
    assert(a.tokens === 5000L && a.rate === 0.5)
    assert(b.rate === 1.0, "budget above supply caps at keep-everything")
    val yieldA = kept.filter(col("source") === "crawl_a")
      .agg(sum(graft.text.TextAnalysis.tokenCount(col("text"))))
      .as[Long].head()
    assert(math.abs(yieldA - 2500L) < 3 * 5 * math.sqrt(250.0)) // 3σ · tok/doc
    assert(kept.filter(col("source") === "crawl_b").count() === 1000L)
    // a source with no budget row is absent from the mix and the stats
    val (only, st2) = CorpusMix.mixByTokenBudget(df, "url", "text",
      "source", Map("crawl_a" -> 2500L), "mix-v1")
    assert(only.filter(col("source") === "crawl_b").count() === 0L)
    assert(st2.map(_.source) === Seq("crawl_a"))
  }

  test("exact truncation: the u60-ordered prefix that crosses the budget") {
    val df = Seq(
      ("u1", "s", "one two"),          // 2 tokens each
      ("u2", "s", "one two"),
      ("u3", "s", "one two"),
      ("u4", "s", "one two"),
      ("other", "t", "x y z")).toDF("url", "source", "text")
    val kept = CorpusMix.truncateToBudget(df, "url", "text", "source",
      Map("s" -> 5L), "mix-v1")
    // 5-token budget over 2-token docs: cum 2,4,6 -> the 6 CROSSES (4 < 5)
    // and is the last kept; doc 4 (cum 8, prev 6 >= 5) drops; source t
    // has no budget and drops entirely
    assert(kept.count() === 3L)
    assert(kept.filter(col("source") === "t").count() === 0L)
    // the prefix is the u60 order, so it is reproducible across runs
    val order = df.filter(col("source") === "s")
      .withColumn("u", CorpusMix.u60(col("url"), "mix-v1"))
      .orderBy("u").select("url").as[String].collect()
    val keptIds = kept.select("url").as[String].collect().toSet
    assert(keptIds === order.take(3).toSet)
  }

  test("sample-then-truncate ≡ truncate: same-variate prefixes compose exactly") {
    val df = corpus(2000) // 5 tokens/doc, 10k tokens per source
    val budgets = Map("crawl_a" -> 2000L, "crawl_b" -> 500L)
    val direct = CorpusMix.truncateToBudget(df, "url", "text", "source",
      budgets, "mix-v1").select("url").as[String].collect().sorted.toSeq
    // the scale recipe: sample at (1+ε)·budget/tokens first, truncate the
    // survivor set — bit-identical to truncating the full source, because
    // threshold sampling keeps exactly the u60-smallest fraction and the
    // truncation prefix is the same u60 order
    val recipe = CorpusMix.sampleThenTruncate(df, "url", "text", "source",
      budgets, "mix-v1", headroom = 0.25)
      .select("url").as[String].collect().sorted.toSeq
    assert(recipe === direct)
    // and the pre-truncation window really does see only the sample: the
    // 20% rate admits ~400 of 1000 crawl_a docs, not the source
    val (sampled, _) = CorpusMix.mixByTokenBudget(df, "url", "text", "source",
      budgets.map { case (s, b) => s -> (b * 5 / 4) }, "mix-v1")
    assert(sampled.filter(col("source") === "crawl_a").count() < 600L)
  }

  test("exact-budget undershoot fails loudly instead of shipping a short mix") {
    // one 100-token doc whose variate falls ABOVE the pre-sample threshold
    // plus one small doc below it: at headroom 0 the sample keeps only the
    // small doc (≈5 of 100 budget tokens) while the full source could pay —
    // the documented failure mode, which must throw, not under-deliver
    val thr = CorpusMix.thresholdFor(100.0 / 105.0)
    def u(id: String) = CorpusMix.u60(lit(id), "mix-v1")
    val ids = (0 until 200).map(i => s"http://u$i.test/p")
    val us = spark.range(1).select(array(ids.map(u): _*)).as[Seq[Long]].head()
    val big = ids(us.indexWhere(_ >= thr))
    val small = ids(us.indexWhere(_ < thr))
    val df = Seq(
      (big, "solo", Seq.fill(100)("w").mkString(" ")),
      (small, "solo", "five tiny tokens right here")
    ).toDF("url", "source", "text")
    val e = intercept[IllegalStateException] {
      CorpusMix.sampleThenTruncate(df, "url", "text", "source",
        Map("solo" -> 100L), "mix-v1", headroom = 0.0)
    }
    assert(e.getMessage.contains("undershoot") && e.getMessage.contains("solo"))
    // enough headroom → rate hits 1, sample = source, no throw, exact result
    val ok = CorpusMix.sampleThenTruncate(df, "url", "text", "source",
      Map("solo" -> 100L), "mix-v1", headroom = 1.0)
    // u(small) < u(big), so the prefix is small (cum 5) then big (the
    // crossing row, kept): both survive — identical to direct truncation
    assert(ok.count() === 2L)
  }

  test("up-sampling: copies = floor(rate) + fractional epoch, deterministic") {
    val df = corpus(1000) // 500 per source
    val up = CorpusMix.upsampleBySourceRates(df, "url", "source",
      Map("crawl_a" -> 2.5, "crawl_b" -> 0.5), "mix-v1")
    val rows = up.select("url", "source", "epoch")
      .as[(String, String, Long)].collect()
    // per-doc epochs are contiguous ordinals 0..copies-1
    rows.groupBy(_._1).values.foreach { spans =>
      assert(spans.map(_._3).sorted.toSeq === (0L until spans.length).toSeq)
    }
    // crawl_a docs appear exactly 2 or 3 times, total ~2.5x (3σ binomial)
    val aCounts = rows.filter(_._2 == "crawl_a").groupBy(_._1).map(_._2.length)
    assert(aCounts.forall(c => c == 2 || c == 3))
    assert(math.abs(rows.count(_._2 == "crawl_a") - 1250) < 3 * math.sqrt(125.0))
    // crawl_b at 0.5: plain sampling with epoch 0
    assert(rows.filter(_._2 == "crawl_b").forall(_._3 == 0L))
    // bit-for-bit reproducible over a reshuffled input
    val again = CorpusMix.upsampleBySourceRates(df.repartition(7), "url",
      "source", Map("crawl_a" -> 2.5, "crawl_b" -> 0.5), "mix-v1")
      .select("url", "epoch").as[(String, Long)].collect().sorted.toSeq
    assert(again === rows.map(r => (r._1, r._3)).sorted.toSeq)
  }

  test("up-sampling degenerates to sampling at rate <= 1; recipes nest") {
    val df = corpus(1000)
    val rates = Map("crawl_a" -> 0.4, "crawl_b" -> 0.7)
    val plain = CorpusMix.sampleBySourceRates(df, "url", "source", rates,
      "mix-v1").select("url").as[String].collect().toSet
    val up = CorpusMix.upsampleBySourceRates(df, "url", "source", rates,
      "mix-v1")
    assert(up.select("epoch").distinct().as[Long].collect().toSeq === Seq(0L))
    assert(up.select("url").as[String].collect().toSet === plain,
      "the fractional epoch IS the plain sample at the same rate")
    // raising a rate only ADDS (id, epoch) pairs — recipe iteration is
    // monotone across both the fractional and the whole part
    def pairs(r: Double) = CorpusMix.upsampleBySourceRates(df, "url",
      "source", Map("crawl_a" -> r, "crawl_b" -> r), "mix-v1")
      .select("url", "epoch").as[(String, Long)].collect().toSet
    val p1 = pairs(0.75); val p2 = pairs(2.25); val p3 = pairs(2.75)
    assert(p1.subsetOf(p2) && p2.subsetOf(p3))
  }

  test("per-document permille sampling: endpoint-exact, near-rate, monotone") {
    val df = spark.range(22000).select(
      concat(lit("u"), col("id")).as("url"),
      (col("id") % 11 * 100).cast("long").as("mille")) // 0,100,…,1000 × 2000
    val kept = CorpusMix.sampleByRatePerMille(df, "url", col("mille"), "mix-v1")
    val byMille = kept.groupBy("mille").count().as[(Long, Long)].collect().toMap
    assert(!byMille.contains(0L), "permille 0 keeps nothing, exactly")
    assert(byMille(1000L) === 2000L, "permille 1000 keeps everything, exactly")
    Seq(300L, 700L).foreach { m =>
      val p = m / 1000.0
      assert(math.abs(byMille(m) - 2000 * p) < 4 * math.sqrt(2000 * p * (1 - p)),
        s"permille $m kept ${byMille(m)}")
    }
    // monotone per document: a doc kept at permille r stays kept at r' > r
    def at(m: Long) = CorpusMix.sampleByRatePerMille(
      df.withColumn("mille", lit(m)), "url", col("mille"), "mix-v1")
      .select("url").as[String].collect().toSet
    val k3 = at(300L); val k7 = at(700L)
    assert(k3.subsetOf(k7))
    // and deterministic under reshuffle
    assert(CorpusMix.sampleByRatePerMille(df.repartition(9), "url",
        col("mille"), "mix-v1").select("url").as[String].collect().sorted.toSeq
      === kept.select("url").as[String].collect().sorted.toSeq)
  }

  test("union corpora: tag + align by name; sampling keys on the tag") {
    // corpus A carries an extra column corpus B lacks — unionByName fills null
    val a = spark.range(400).select(
      concat(lit("http://a"), col("id"), lit(".test/")).as("url"),
      lit("alpha body words").as("text"), lit("en").as("lang"))
    val b = spark.range(400).select(
      concat(lit("http://b"), col("id"), lit(".test/")).as("url"),
      lit("beta body").as("text"))
    val u = CorpusMix.unionCorpora(Seq("web" -> a, "books" -> b))
    assert(u.count() === 800)
    assert(u.filter(col("source") === "books").filter(col("lang").isNotNull)
      .count() === 0)
    assert(u.filter(col("source") === "web").filter(col("lang") =!= "en")
      .count() === 0)
    // sampling the union ≡ sampling each corpus alone: the tag is the key
    // and decisions are per-row, so assembly order cannot leak into fates
    val rates = Map("web" -> 0.7, "books" -> 0.2)
    val whole = CorpusMix.sampleBySourceRates(u, "url", "source", rates, "mix-v1")
      .select("url").as[String].collect().toSet
    val apart = Seq("web" -> a, "books" -> b).map { case (n, df) =>
      CorpusMix.sampleBySourceRates(CorpusMix.unionCorpora(Seq(n -> df)),
        "url", "source", rates, "mix-v1")
        .select("url").as[String].collect().toSet
    }.reduce(_ ++ _)
    assert(whole === apart)
    // scale shape: union + tag + sample is still scan-riding — no exchange
    val plan = CorpusMix.sampleBySourceRates(u, "url", "source", rates, "mix-v1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"union mixing must stay per-row over unioned scans:\n$plan")
    // a silently doubled corpus would corrupt the mix: duplicate names throw
    intercept[IllegalArgumentException] {
      CorpusMix.unionCorpora(Seq("web" -> a, "web" -> b))
    }
  }

  test("shard assignment: uniform, in-range, salt-independent of the mix") {
    val df = corpus(4000)
    val counts = df.select(ShardedExport.shardOf(col("url"), 8).as("shard"))
      .groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(counts.keySet === (0 until 8).toSet)
    // 4000 over 8 shards: every shard within ±4σ of 500
    counts.values.foreach(c =>
      assert(math.abs(c - 500L) < 4 * math.sqrt(500.0 * 7 / 8), counts))
  }

  test("export: one file per shard, id-ordered rows, faithful manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = corpus(600)
    val stats = ShardedExport.exportShards(spark, df, "url", "text",
      dir, nShards = 4)
    assert(stats.map(_.shard) === Seq(0, 1, 2, 3))
    assert(stats.map(_.docs).sum === 600L)
    // layout: exactly one parquet part per shard directory
    (0 until 4).foreach { k =>
      val parts = new java.io.File(s"$dir/shard=$k").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"shard $k must be one file")
    }
    // within a shard, rows are written in id order (loader determinism)
    val s0 = spark.read.parquet(s"$dir/shard=0").select("url")
      .as[String].collect()
    assert(s0.toSeq === s0.sorted.toSeq)
    // manifest totals agree with the data and parse as JSON
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_manifest.json")), "UTF-8")
    assert(manifest.contains("\"n_shards\": 4"))
    assert(manifest.contains("\"docs\": 600"))
    val tokTotal = df.agg(sum(graft.text.TextAnalysis.tokenCount(col("text"))))
      .as[Long].head()
    assert(stats.map(_.tokens).sum === tokTotal)
    // re-export reproduces byte-identical shard membership
    val again = ShardedExport.exportShards(spark, df.repartition(13),
      "url", "text", dir, nShards = 4)
    assert(again === stats)
  }

  test("token metric seam: subword n_tokens and manifest lineage") {
    val df = corpus(100)
    val dir = java.nio.file.Files.createTempDirectory("graft-tokmetric").toString
    ShardedExport.exportShards(spark, df, "url", "text", dir, nShards = 2,
      tokenMetric = "subword")
    val expect = df.select(col("url"),
        graft.text.TextAnalysis.subwordCount(col("text")))
      .as[(String, Long)].collect().toMap
    spark.read.parquet(dir).select("url", "n_tokens").as[(String, Long)]
      .collect().foreach { case (u, n) => assert(n === expect(u)) }
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_manifest.json")), "UTF-8")
    assert(manifest.contains("\"token_metric\": \"subword\""))
    assert(manifest.contains("\"row_order\": \"id\""))
    assert(manifest.contains("\"epoch_keyed\": false"))
  }

  test("jsonl export: gzipped one-file shards, round-trip, observe-fused stats") {
    val df = corpus(300)
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val (docs, tokens) = ShardedExport.exportShardsJsonl(
      spark, df, "url", "text", dir, nShards = 4)
    assert(docs === 300L)
    assert(tokens === df.agg(sum(
      graft.text.TextAnalysis.tokenCount(col("text")))).as[Long].head())
    (0 until 4).foreach { k =>
      val parts = new java.io.File(s"$dir/shard=$k").listFiles()
        .filter(_.getName.endsWith(".txt.gz"))
      assert(parts.length === 1, s"shard $k must be one gzipped file")
    }
    // round-trip: every row is a complete JSON object incl n_tokens
    val back = spark.read.json(dir)
    assert(back.count() === 300L)
    assert(back.columns.toSet === Set("url", "source", "text", "n_tokens", "shard"))
    // membership is the SAME shard function as the parquet format
    val mismatch = back.withColumn("expect",
        ShardedExport.shardOf(col("url"), 4).cast("long"))
      .filter(col("shard").cast("long") =!= col("expect")).count()
    assert(mismatch === 0L)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_manifest.json")), "UTF-8")
    assert(manifest.contains("\"format\": \"jsonl\""))
    assert(manifest.contains("\"docs\": 300"))
    assert(manifest.contains("\"bytes\":"))
    // manifest bytes count DATA files only (no .crc checksum side-files)
    val f0 = new java.io.File(s"$dir/shard=0").listFiles()
      .filter(_.getName.endsWith(".txt.gz")).head
    assert(manifest.contains(s""""shard":0,"bytes":${f0.length}"""))
    // in-shard rows are id-ordered, same contract as the parquet format
    // (one gz file = one unsplittable read partition = file order)
    val s0 = spark.read.json(f0.getPath).select("url").as[String].collect()
    assert(s0.toSeq === s0.sorted.toSeq && s0.nonEmpty)
    // the verifier replays the jsonl accounting (bytes + full re-read)
    val (issues, vd, vt) = ShardedExport.verifyExport(spark, dir)
    assert(issues.isEmpty && vd === 300L && vt === tokens, issues)
  }

  test("null ids: dropped and counted, never a __HIVE_DEFAULT_PARTITION__") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nullid").toString
    val withNull = corpus(50).unionByName(
      Seq((null: String, "crawl_a", "orphan text")).toDF("url", "source", "text"))
    val stats = ShardedExport.exportShards(spark, withNull, "url", "text",
      dir, nShards = 3)
    assert(stats.map(_.docs).sum === 50L)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_manifest.json")), "UTF-8")
    assert(manifest.contains("\"dropped_null_key\": 1"))
    assert(!new java.io.File(s"$dir/shard=__HIVE_DEFAULT_PARTITION__").exists())
    val (issues, vd, _) = ShardedExport.verifyExport(spark, dir)
    assert(issues.isEmpty && vd === 50L, issues)
    // same contract on the jsonl format
    val jdir = java.nio.file.Files.createTempDirectory("graft-nullid-j").toString
    val (jd, _) = ShardedExport.exportShardsJsonl(spark, withNull, "url", "text",
      jdir, nShards = 3)
    assert(jd === 50L)
    val (jIssues, jvd, _) = ShardedExport.verifyExport(spark, jdir)
    assert(jIssues.isEmpty && jvd === 50L, jIssues)
  }

  test("empty export: valid zero manifest, verify reports clean, no crash") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val stats = ShardedExport.exportShards(spark, corpus(10).where(lit(false)),
      "url", "text", dir, nShards = 4)
    assert(stats.isEmpty)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_manifest.json")), "UTF-8")
    assert(manifest.contains("\"docs\": 0"))
    val (issues, vd, vt) = ShardedExport.verifyExport(spark, dir)
    assert(issues.isEmpty && vd === 0L && vt === 0L, issues)
    val jdir = java.nio.file.Files.createTempDirectory("graft-empty-j").toString
    val (jd, jt) = ShardedExport.exportShardsJsonl(spark,
      corpus(10).where(lit(false)), "url", "text", jdir, nShards = 4)
    assert(jd === 0L && jt === 0L)
    val (jIssues, jvd, _) = ShardedExport.verifyExport(spark, jdir)
    assert(jIssues.isEmpty && jvd === 0L, jIssues)
  }

  test("epoch-keyed verify binds the manifest's epoch_col, reports if absent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-epochcol").toString
    val df = corpus(80).withColumn("ep", (length(col("url")) % 3).cast("int"))
    ShardedExport.exportShards(spark, df, "url", "text", dir, nShards = 3,
      epochCol = Some("ep"))
    val mPath = java.nio.file.Paths.get(s"$dir/_manifest.json")
    val manifest = new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8")
    assert(manifest.contains("\"epoch_col\": \"ep\""))
    // verify resolves the custom column name from the manifest — no
    // UNRESOLVED_COLUMN throw, no issues
    val (issues, vd, _) = ShardedExport.verifyExport(spark, dir)
    assert(issues.isEmpty && vd === 80L, issues)
    // a manifest promising an epoch column the data lacks is a REPORTED
    // verification failure, not an exception out of the verifier
    // (drop the local-FS .crc side-file too: a hand edit outside Hadoop
    // would otherwise read back as a checksum failure, a different issue)
    java.nio.file.Files.write(mPath,
      manifest.replace("\"epoch_col\": \"ep\"", "\"epoch_col\": \"gone\"")
        .getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/._manifest.json.crc"))
    val (issues2, vd2, _) = ShardedExport.verifyExport(spark, dir)
    assert(issues2.exists(_.contains("gone")) && vd2 === 80L, issues2)
  }

  test("null text budgets as 0 tokens in every mix mode; empty sources pass") {
    val df = corpus(100).unionByName(
      Seq(("http://n.test/1", "crawl_a", null: String))
        .toDF("url", "source", "text"))
    // exact truncation: the null-text doc packs into the prefix for free
    // instead of nulling the cumsum comparison and vanishing
    val big = Map("crawl_a" -> 100000L, "crawl_b" -> 100000L)
    val out = CorpusMix.truncateToBudget(df, "url", "text", "source", big, "mix-v1")
    assert(out.count() === 101L)
    // budget-rate path: a source of ONLY null text must not NPE the driver
    val allNull = Seq(
      ("http://x.test/1", "nulls", null: String),
      ("http://x.test/2", "nulls", null: String)).toDF("url", "source", "text")
    val (_, stats) = CorpusMix.mixByTokenBudget(df.unionByName(allNull),
      "url", "text", "source", Map("nulls" -> 10L, "crawl_a" -> 100000L), "mix-v1")
    assert(stats.find(_.source == "nulls").get.tokens === 0L)
    // exact mode with a zero-token budgeted source (typo'd or empty): the
    // result IS truncating the full empty source — vacuously exact, no throw
    val st = CorpusMix.sampleThenTruncate(df, "url", "text", "source",
      Map("crawl_a" -> 100000L, "ghost" -> 500L), "mix-v1")
    assert(st.filter(col("source") === "ghost").count() === 0L)
  }

  test("mix config files parse: defaults, comments, bad lines") {
    def write(lines: String*): String = {
      val f = java.nio.file.Files.createTempFile("graft-mix", ".txt")
      java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
      f.toString
    }
    assert(Main.readMixFile(write("# crawl mix", "crawl_a 0.5", "* 0.1"),
      "--mix-rates", _.toDoubleOption) ===
      Right((Map("crawl_a" -> 0.5), Some(0.1))))
    assert(Main.readMixFile(write("crawl_a 2500", "crawl_b 50000"),
      "--mix-budgets", _.toLongOption) ===
      Right((Map("crawl_a" -> 2500L, "crawl_b" -> 50000L), None)))
    assert(Main.readMixFile(write("crawl_a notanumber"),
      "--mix-rates", _.toDoubleOption).isLeft)
    assert(Main.readMixFile(write("justonesource"),
      "--mix-rates", _.toDoubleOption).isLeft)
  }

  test("--export-shards CLI: dedup verdict applied, mix sampled, loader layout") {
    def tmp(prefix: String) =
      java.nio.file.Files.createTempDirectory(prefix).toString
    val pagesDir = tmp("graft-export-pages")
    val state = tmp("graft-export-state")
    // 12 docs, 6 per lang; docs 2 and 3 are exact duplicates (url-asc
    // priority makes .../d2 the representative, .../d3 the planned dup)
    val dupText = "Identical duplicated body text, exactly the same twice."
    (0 until 12).map { i =>
      // non-dup texts share NO vocabulary (every word is i-suffixed), so
      // the near-dup channels cannot legitimately cluster them
      val text = if (i == 2 || i == 3) dupText
                 else s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i."
      (s"http://site$i.test/d$i", text, if (i % 2 == 0) "en" else "de")
    }.toDF("url", "text", "lang")
      .write.mode("overwrite").parquet(pagesDir)
    // epoch 1 establishes the verdict
    Main.run(spark, Main.parse(
      Seq("--pages", pagesDir, "--state", state)).toOption.get)
    // export: duplicates drop, shards + manifest appear
    val out = tmp("graft-export-out")
    val lines = Main.run(spark, Main.parse(Seq("--pages", pagesDir,
      "--state", state, "--export-shards", out, "--n-shards", "2"))
      .toOption.get)
    assert(lines.exists(_.contains(""""n_shards":2""")))
    val exported = spark.read.parquet(out)
    assert(exported.count() === 11) // the planned duplicate is gone
    assert(exported.filter(col("url") === "http://site3.test/d3").count() === 0)
    assert(exported.filter(col("url") === "http://site2.test/d2").count() === 1)
    assert(exported.columns.toSet ===
      Set("url", "text", "lang", "shard", "n_tokens"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/_manifest.json")))
    // mixed export: rates file keeps only en (default 0)
    val rates = java.nio.file.Files.createTempFile("graft-rates", ".txt")
    java.nio.file.Files.write(rates, "en 1.0\n".getBytes("UTF-8"))
    val out2 = tmp("graft-export-mixed")
    Main.run(spark, Main.parse(Seq("--pages", pagesDir, "--state", state,
      "--export-shards", out2, "--n-shards", "2",
      "--mix-rates", rates.toString)).toOption.get)
    val mixed = spark.read.parquet(out2)
    assert(mixed.filter(col("lang") === "de").count() === 0)
    assert(mixed.filter(col("lang") === "en").count() === 6) // all en survive
    // (the dropped duplicate d3 is a de doc — the mix dropped it anyway)
    // budget-mixed export emits per-source stat lines
    val budgets = java.nio.file.Files.createTempFile("graft-budgets", ".txt")
    java.nio.file.Files.write(budgets, "en 100000\nde 100000\n".getBytes("UTF-8"))
    val out3 = tmp("graft-export-budget")
    val blines = Main.run(spark, Main.parse(Seq("--pages", pagesDir,
      "--state", state, "--export-shards", out3, "--n-shards", "2",
      "--mix-budgets", budgets.toString)).toOption.get)
    assert(blines.count(_.contains(""""mix_source"""")) === 2)
    assert(blines.exists(l => l.contains(""""mix_source":"en"""") &&
      l.contains(""""rate":1.0""")))
    assert(spark.read.parquet(out3).count() === 11)
    // --mix-exact: the export equals truncateToBudget over the same
    // verdict-filtered corpus (out3 is exactly that corpus: keep-all budgets)
    val exact = java.nio.file.Files.createTempFile("graft-exact", ".txt")
    java.nio.file.Files.write(exact, "en 20\nde 100000\n".getBytes("UTF-8"))
    val out4 = tmp("graft-export-exact")
    // headroom 3.0: at SIX docs per source the default ε=0.05 undershoots
    // with real probability (the Chernoff bound needs budget ≫ doc
    // tokens); the big ε makes the pre-sample keep-all here, and the
    // genuine sample∘truncate composition is pinned at n=2000 by the
    // library spec above
    Main.run(spark, Main.parse(Seq("--pages", pagesDir, "--state", state,
      "--export-shards", out4, "--n-shards", "2",
      "--mix-budgets", exact.toString, "--mix-exact",
      "--mix-headroom", "3.0")).toOption.get)
    val base = spark.read.parquet(out3).select("url", "lang", "text")
    val want = CorpusMix.truncateToBudget(base, "url", "text", "lang",
      Map("en" -> 20L, "de" -> 100000L), "mix-v1")
      .select("url").as[String].collect().toSet
    assert(want.nonEmpty && want.size < 11, s"budget must cut: $want")
    assert(spark.read.parquet(out4)
      .select("url").as[String].collect().toSet === want)
    // up-sampled + packed export: en at 2.0 epochs, de unlisted (rate 0) —
    // 6 en survivors × exactly 2 copies, epoch column written, shard key
    // spreads copies, pack plan lands under _pack (invisible to corpus reads)
    val uprates = java.nio.file.Files.createTempFile("graft-uprates", ".txt")
    java.nio.file.Files.write(uprates, "en 2.0\n".getBytes("UTF-8"))
    val out5 = tmp("graft-export-up")
    val ulines = Main.run(spark, Main.parse(Seq("--pages", pagesDir,
      "--state", state, "--export-shards", out5, "--n-shards", "2",
      "--mix-rates", uprates.toString, "--pack-len", "8")).toOption.get)
    val up = spark.read.parquet(out5)
    assert(up.count() === 12L)
    assert(up.filter(col("lang") === "de").count() === 0L)
    assert(up.groupBy("url").count().as[(String, Long)].collect()
      .forall(_._2 == 2L), "every en doc appears in exactly 2 epochs")
    assert(ulines.exists(l => l.contains(""""seq_len":8""") &&
      l.contains(""""examples":""")))
    assert(spark.read.parquet(s"$out5/_pack").count() >= 1L)
    assert(!up.columns.contains("example"), "_pack must not leak into the corpus")
    // trust-but-verify: the standalone checker agrees with a fresh export
    // (epoch-keyed shard function and all), then catches a doctored manifest
    val vOk = Main.run(spark, Main.parse(Seq("--verify-export", out5)).toOption.get)
    assert(vOk.exists(_.contains(""""verified":true""")), vOk)
    val mp = java.nio.file.Paths.get(s"$out5/_manifest.json")
    val doctored = new String(java.nio.file.Files.readAllBytes(mp), "UTF-8")
      .replace("\"docs\": 12", "\"docs\": 13")
    java.nio.file.Files.write(mp, doctored.getBytes("UTF-8"))
    // the hand edit left a stale hadoop .crc sidecar; with it in place the
    // verifier reports "unreadable" (also correct) — drop it to reach the
    // accounting comparison
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$out5/._manifest.json.crc"))
    val vBad = Main.run(spark, Main.parse(Seq("--verify-export", out5)).toOption.get)
    assert(vBad.exists(l => l.contains(""""verified":false""") &&
      l.contains("13 docs")), vBad)
  }

  test("--semdedup-tau CLI: the embedding verdict drops semantic dups at export") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val corp = tmp("graft-sem-corpus")
    (0 until 6).map(i => (s"http://d$i.test/", s"body $i unique words $i"))
      .toDF("url", "text").write.mode("overwrite").parquet(corp)
    // d0 and d1 carry identical embeddings (semantic dups), d2-d4 are
    // orthogonal, d5 has NO embedding row — no evidence, must survive.
    // a-ghost is an embedding for a doc NOT in the corpus: it sorts first
    // on the keeper tie-break, so if stray embeddings could join
    // components it would win d0/d1's election and the export would lose
    // the whole component — the verdict must form over export candidates
    // only
    val emb = tmp("graft-sem-emb")
    Seq(
      ("http://a-ghost.test/", Seq(1f, 0f, 0f, 0f)),
      ("http://d0.test/", Seq(1f, 0f, 0f, 0f)),
      ("http://d1.test/", Seq(1f, 0f, 0f, 0f)),
      ("http://d2.test/", Seq(0f, 1f, 0f, 0f)),
      ("http://d3.test/", Seq(0f, 0f, 1f, 0f)),
      ("http://d4.test/", Seq(0f, 0f, 0f, 1f)))
      .toDF("url", "embedding").write.mode("overwrite").parquet(emb)
    val state = tmp("graft-sem-state"); val out = tmp("graft-sem-out")
    Main.run(spark, Main.parse(Seq("--pages", corp, "--state", state,
      "--export-shards", out, "--n-shards", "2",
      "--embeddings", emb, "--semdedup-tau", "0.95")).toOption.get)
    val got = spark.read.parquet(out).select("url").as[String].collect().toSet
    assert(got.size === 5, got)
    assert(got.count(u => u == "http://d0.test/" || u == "http://d1.test/") === 1)
    assert(Set("http://d2.test/", "http://d3.test/", "http://d4.test/",
      "http://d5.test/").subsetOf(got))
  }

  test("--mix-from CLI: separate corpora union under tag-keyed rates") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val cA = tmp("graft-mixfrom-a"); val cB = tmp("graft-mixfrom-b")
    (0 until 8).map(i => (s"http://a$i.test/", s"alpha$i beta$i gamma$i"))
      .toDF("url", "text").write.mode("overwrite").parquet(cA)
    (0 until 8).map(i => (s"http://b$i.test/", s"delta$i epsilon$i"))
      .toDF("url", "text").write.mode("overwrite").parquet(cB)
    val srcs = java.nio.file.Files.createTempFile("graft-sources", ".txt")
    java.nio.file.Files.write(srcs,
      s"# corpora\nweb $cA\nbooks $cB\n".getBytes("UTF-8"))
    val rates = java.nio.file.Files.createTempFile("graft-mf-rates", ".txt")
    java.nio.file.Files.write(rates, "web 1.0\nbooks 1.0\n".getBytes("UTF-8"))
    // fresh state (no epoch has run): the export is verdict-unfiltered
    val state = tmp("graft-mixfrom-state")
    val out = tmp("graft-mixfrom-out")
    Main.run(spark, Main.parse(Seq("--mix-from", srcs.toString,
      "--state", state, "--export-shards", out, "--n-shards", "2",
      "--mix-rates", rates.toString)).toOption.get)
    val got = spark.read.parquet(out)
    assert(got.count() === 16)
    assert(got.filter(col("source") === "web").count() === 8)
    assert(got.filter(col("source") === "books").count() === 8)
    // rates key on the corpus TAG: an unlisted corpus drops wholesale
    val rOnly = java.nio.file.Files.createTempFile("graft-mf-only", ".txt")
    java.nio.file.Files.write(rOnly, "web 1.0\n".getBytes("UTF-8"))
    val out2 = tmp("graft-mixfrom-only")
    Main.run(spark, Main.parse(Seq("--mix-from", srcs.toString,
      "--state", state, "--export-shards", out2, "--n-shards", "2",
      "--mix-rates", rOnly.toString)).toOption.get)
    val only = spark.read.parquet(out2)
    assert(only.count() === 8)
    assert(only.filter(col("source") =!= "web").count() === 0)
    // the standalone verifier accepts the union export's accounting
    val (issues, vd, _) = ShardedExport.verifyExport(spark, out)
    assert(issues.isEmpty && vd === 16L, issues)
    // sources-file hygiene: duplicate corpus names and '*' are errors
    assert(Main.readSourcesFile(srcs.toString).isRight)
    val dup = java.nio.file.Files.createTempFile("graft-mf-dup", ".txt")
    java.nio.file.Files.write(dup, s"web $cA\nweb $cB\n".getBytes("UTF-8"))
    assert(Main.readSourcesFile(dup.toString).isLeft)
    val star = java.nio.file.Files.createTempFile("graft-mf-star", ".txt")
    java.nio.file.Files.write(star, s"* $cA\n".getBytes("UTF-8"))
    assert(Main.readSourcesFile(star.toString).isLeft)
  }
}
