package graft

import org.apache.spark.sql.functions._

import graft.mix.{SequencePack, ShardedExport}

/** A17 sequence packing: the fixed-length-example plan's closed-form
  * invariants (waste-free examples, exact document tiling), and the
  * loader contract — a sequential read of a pack-ordered shard file
  * reproduces the plan span for span.
  */
class PackSpec extends SparkTestBase {
  import spark.implicits._

  /** 1 + id%7 tokens per doc, so docs straddle example boundaries often. */
  private def corpus(n: Int) =
    spark.range(n).select(
      concat(lit("http://d"), col("id"), lit(".test/p")).as("url"),
      concat_ws(" ",
        array_repeat(lit("tok"), (col("id") % 7 + 1).cast("int"))).as("text"))

  test("pack plan: every example is exactly L tokens except each shard's last") {
    val plan = SequencePack.plan(corpus(500), "url", "text",
      seqLen = 16, nShards = 4)
    val ex = plan.groupBy("shard", "example")
      .agg(sum(col("tok_end") - col("tok_start")).as("tok"))
      .as[(Int, Long, Long)].collect()
    val lastBy = ex.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    ex.foreach { case (s, e, t) =>
      if (e == lastBy(s)) assert(t >= 1 && t <= 16)
      else assert(t === 16L, s"shard $s example $e must be full")
    }
    // example ids are contiguous from 0 in every shard
    ex.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (0L to lastBy(s)).toSeq)
    }
  }

  test("pack plan: spans tile each document exactly; positions consistent") {
    val plan = SequencePack.plan(corpus(300), "url", "text", 16, 2)
      .select("shard", "example", "url", "pos", "tok_start", "tok_end")
      .as[(Int, Long, String, Long, Long, Long)].collect()
    val toks = corpus(300)
      .select(col("url"), graft.text.TextAnalysis.tokenCount(col("text")))
      .as[(String, Long)].collect().toMap
    plan.groupBy(_._3).foreach { case (url, spans) =>
      val s = spans.sortBy(_._2)
      assert(s.head._5 === 0L, "first span starts at token 0")
      assert(s.last._6 === toks(url), "last span ends at the doc's token count")
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 === b._5, "spans are contiguous")
          assert(b._2 === a._2 + 1, "continuation spans hit consecutive examples")
          assert(b._4 === 0L, "a continuation starts at in-example position 0")
        case _ =>
      }
    }
    plan.foreach { case (_, _, _, pos, ts, te) =>
      assert(pos >= 0 && ts >= 0 && te > ts && pos + (te - ts) <= 16)
    }
  }

  test("loader contract: sequential read of pack-ordered shards ≡ the plan") {
    val df = corpus(400)
    val out = java.nio.file.Files.createTempDirectory("graft-pack").toString
    ShardedExport.exportShards(spark, df, "url", "text", out, nShards = 4,
      packOrder = true)
    val (examples, planRows) = SequencePack.writePlan(spark, out, "url",
      seqLen = 16, nShards = 4)
    assert(examples >= 1 && planRows >= examples)
    val plan = spark.read.parquet(s"$out/_pack")
    for (shard <- 0 until 4) {
      val parts = new java.io.File(s"$out/shard=$shard").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"shard $shard must be one file")
      // one tiny file = one scan partition; collect preserves its row order
      val fileRows = spark.read.parquet(parts.head.getPath)
        .select("url", "n_tokens").as[(String, Long)].collect()
      // simulate the loader: walk the file in order, cut every 16 tokens
      var off = 0L
      val sim = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Long, Long)]()
      fileRows.filter(_._2 > 0).foreach { case (url, tok) =>
        var e = off / 16
        val last = (off + tok - 1) / 16
        while (e <= last) {
          sim += ((e, url, math.max(0L, off - e * 16),
            math.max(0L, e * 16 - off), math.min(tok, (e + 1) * 16 - off)))
          e += 1
        }
        off += tok
      }
      val got = plan.filter(col("shard") === shard)
        .select("example", "url", "pos", "tok_start", "tok_end")
        .as[(Long, String, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._3)).toSeq
      assert(got === sim.sortBy(r => (r._1, r._3)).toSeq,
        s"shard $shard plan must equal the sequential-read simulation")
    }
  }

  test("writePlan refuses an id-ordered export (the seek contract would lie)") {
    val df = corpus(100)
    val out = java.nio.file.Files.createTempDirectory("graft-pack-id").toString
    ShardedExport.exportShards(spark, df, "url", "text", out, nShards = 2)
    val e = intercept[IllegalArgumentException] {
      SequencePack.writePlan(spark, out, "url", seqLen = 16, nShards = 2)
    }
    assert(e.getMessage.contains("pack order"))
    // the explicit opt-out still works for join-by-id consumers
    val (examples, rows) = SequencePack.writePlan(spark, out, "url",
      seqLen = 16, nShards = 2, requirePackOrder = false)
    assert(examples >= 1 && rows >= examples)
  }

  test("writePlan cross-checks the manifest's epoch lineage") {
    val df = graft.mix.CorpusMix.upsampleBySourceRates(
      corpus(60).withColumn("source", lit("wiki")),
      "url", "source", Map("wiki" -> 2.0), "mix-v1")
    val out = java.nio.file.Files.createTempDirectory("graft-pack-ep").toString
    ShardedExport.exportShards(spark, df, "url", "text", out, nShards = 2,
      epochCol = Some("epoch"), packOrder = true)
    // planning an epoch-keyed export WITHOUT its epoch column would tie
    // repeat copies on every sort key and double-count offsets — refused
    val e = intercept[IllegalArgumentException] {
      SequencePack.writePlan(spark, out, "url", seqLen = 16, nShards = 2)
    }
    assert(e.getMessage.contains("epoch"))
    // the wrong column NAME is refused too (manifest records epoch_col)
    val e2 = intercept[IllegalArgumentException] {
      SequencePack.writePlan(spark, out, "url", seqLen = 16, nShards = 2,
        epochCol = Some("ep_wrong"))
    }
    assert(e2.getMessage.contains("epoch"))
    // the recorded column plans fine, and the observe-fused accounting
    // equals a read-back recount of the written plan
    val (examples, rows) = SequencePack.writePlan(spark, out, "url",
      seqLen = 16, nShards = 2, epochCol = Some("epoch"))
    val back = spark.read.parquet(s"$out/_pack")
    val (exBack, rowsBack) = (
      back.select(countDistinct(col("shard"), col("example"))).as[Long].head(),
      back.count())
    assert(examples === exBack && rows === rowsBack)
    // a non-epoch plan over a non-epoch export still passes (regression)
    val out2 = java.nio.file.Files.createTempDirectory("graft-pack-ne").toString
    ShardedExport.exportShards(spark, corpus(40), "url", "text", out2,
      nShards = 2, packOrder = true)
    intercept[IllegalArgumentException] {
      SequencePack.writePlan(spark, out2, "url", seqLen = 16, nShards = 2,
        epochCol = Some("epoch"))
    }
    val (ex2, rows2) = SequencePack.writePlan(spark, out2, "url",
      seqLen = 16, nShards = 2)
    assert(ex2 >= 1L && rows2 >= ex2)
  }

  test("up-sampled corpora pack by (id, epoch): copies spread and tile") {
    val df = graft.mix.CorpusMix.upsampleBySourceRates(
      corpus(200).withColumn("source", lit("wiki")),
      "url", "source", Map("wiki" -> 3.0), "mix-v1")
    val plan = SequencePack.plan(df, "url", "text", 16, 4,
      epochCol = Some("epoch"))
    // every (url, epoch) copy is planned exactly tok tokens
    val per = plan.groupBy("url", "epoch")
      .agg(sum(col("tok_end") - col("tok_start")).as("tok"))
      .as[(String, Long, Long)].collect()
    val toks = corpus(200)
      .select(col("url"), graft.text.TextAnalysis.tokenCount(col("text")))
      .as[(String, Long)].collect().toMap
    assert(per.length === 600)
    per.foreach { case (url, _, t) => assert(t === toks(url)) }
    // the three copies of one doc do NOT all land in one shard overall
    val spread = plan.groupBy("url").agg(countDistinct("shard").as("s"))
      .agg(max("s")).as[Long].head()
    assert(spread >= 2L, "epoch-keyed sharding must spread repeat copies")
  }
}
