package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.mix.ShardedExport
import graft.pages.{PagesGen, PagesIO}

/** A24: jsonl as an INGESTION format (PagesIO `jsonl`) — declared schema,
  * no inference pass, writer↔reader round-trip fidelity, never-throw on
  * malformed lines.
  */
class JsonlIngestSpec extends SparkTestBase {
  import spark.implicits._

  test("export → ingest round-trip preserves rows, text bytes and n_tokens") {
    val src = PagesGen.pages(spark, 8L, seed = 53L, tokensPerDoc = 40).toDF()
      .select(col("url"), col("text"), col("lang"))
    val dir = Files.createTempDirectory("graft-jsonl-ingest").toString
    val (docs, _) = ShardedExport.exportShardsJsonl(spark, src, "url", "text",
      dir, nShards = 4)
    val back = PagesIO.read(spark, dir, "jsonl")

    val a = src.select("url", "text", "lang").as[(String, String, String)]
      .collect().toSet
    val b = back.select("url", "text", "lang").as[(String, String, String)]
      .collect().toSet
    assert(b == a, "jsonl round-trip changed the (url, text, lang) rows")
    assert(back.count() == docs)

    // the writer's n_tokens matches a fresh recount over the read-back text
    val drift = back.filter(
      col("n_tokens") =!= graft.text.TextAnalysis.tokenCount(col("text"))).count()
    assert(drift == 0, s"$drift rows where written n_tokens != recounted tokens")
  }

  test("declared schema: no inference, absent fields null, extra fields ignored") {
    val dir = Files.createTempDirectory("graft-jsonl-extra").toString
    Files.write(Paths.get(dir, "part-0.jsonl"),
      ("""{"url":"u1","text":"hello world","custom_field":42}""" + "\n" +
        """{"url":"u2","text":"second doc","lang":"en","n_tokens":2}""" + "\n")
        .getBytes("UTF-8"))
    val df = PagesIO.read(spark, dir, "jsonl")
    assert(df.schema == PagesIO.JsonlSchema)
    assert(df.count() == 2)
    val byUrl = df.select("url", "lang", "n_tokens")
      .as[(String, Option[String], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byUrl("u1") == ((None, None)), "absent fields must read as null")
    assert(byUrl("u2") == ((Some("en"), Some(2L))))
  }

  test("a malformed line degrades to a null row, never throws") {
    val dir = Files.createTempDirectory("graft-jsonl-bad").toString
    Files.write(Paths.get(dir, "part-0.jsonl"),
      ("""{"url":"ok","text":"fine"}""" + "\n" +
        """{"url":"broken","text": NOT JSON""" + "\n").getBytes("UTF-8"))
    val df = PagesIO.read(spark, dir, "jsonl")
    val urls = df.select("url").as[Option[String]].collect()
    assert(urls.length == 2 && urls.flatten.toSet == Set("ok"),
      s"expected one parsed row + one null row, got ${urls.mkString(",")}")
  }
}
