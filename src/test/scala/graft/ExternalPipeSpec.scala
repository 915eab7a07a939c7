package graft

import org.apache.spark.sql.functions._

import graft.sources.ExternalPipe

/** S12 external-process source analog: one filter process per partition,
  * rows streamed through stdin/stdout with bounded backpressure, hard
  * failure on crash or line-count mismatch (reference shell-out stage,
  * image-deduper src/platform/macos.rs:53-322).
  */
class ExternalPipeSpec extends SparkTestBase {
  import spark.implicits._

  test("pipe matches the equivalent Column transform across partitions") {
    val df = (1 to 500).map(i => (i.toLong, s"alpha doc $i with alpha tokens"))
      .toDF("id", "text").repartition(3)
    val piped = ExternalPipe.pipePartitions(df, "text", "out",
      Seq("sed", "-e", "s/alpha/beta/g"))
    // same transform in-JVM; anti-join both ways = exact row-set equality
    val expected = df.withColumn("out", regexp_replace($"text", "alpha", "beta"))
    assert(piped.count() == 500)
    assert(piped.except(expected).count() == 0 && expected.except(piped).count() == 0)
    // original columns carried through untouched
    assert(piped.schema.fieldNames.toSeq == Seq("id", "text", "out"))
  }

  test("embedded newlines are flattened, nulls become empty lines") {
    val df = Seq((1L, "line\nbreak"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = ExternalPipe.pipePartitions(df, "text", "out", Seq("cat"))
      .orderBy("id").select("out").as[String].collect()
    assert(out.toSeq == Seq("line break", ""))
  }

  test("a crashing filter fails the task loudly, not with dropped rows") {
    val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "text").coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      ExternalPipe.pipePartitions(df, "text", "out",
        Seq("sh", "-c", "head -n 10; exit 3")).count()
    }
    assert(e.getMessage.contains("external pipe") ||
      Option(e.getCause).exists(_.getMessage.contains("external pipe")))
  }

  test("partial consumption (limit) reaps the filter process at task end") {
    // a limit() consumes only a prefix of the partition iterator, so EOF
    // cleanup never runs — the task-completion listener must reap the
    // process (and unpark the writer) or every show/take leaks a sidecar
    val marker = s"graft-pipe-leak-${System.nanoTime()}"
    def markerProcs(): Seq[ProcessHandle] = {
      import scala.jdk.CollectionConverters._
      ProcessHandle.current().descendants().iterator().asScala
        .filter(_.info().commandLine().map[Boolean](_.contains(marker)).orElse(false))
        .toSeq
    }
    val df = (1 to 20000).map(i => (i.toLong, s"row $i")).toDF("id", "text").coalesce(1)
    val piped = ExternalPipe.pipePartitions(df, "text", "out",
      Seq("sh", "-c", s": $marker; exec cat"), queueCapacity = 16)
    assert(piped.limit(5).collect().length == 5)
    val deadline = System.nanoTime() + 10e9.toLong
    while (markerProcs().exists(_.isAlive) && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(!markerProcs().exists(_.isAlive),
      "filter process still alive after partially-consumed task completed")
  }

  test("a stderr-chatty filter never wedges (error stream is not a filling pipe)") {
    // each row makes the filter write ~100 bytes of stderr; 2000 rows ≈
    // 200 KB, several times the OS pipe buffer — with stderr left as a
    // pipe and undrained, the child would block mid-stream and the test
    // would hang instead of completing
    val df = (1 to 2000).map(i => (i.toLong, s"row $i")).toDF("id", "text").coalesce(1)
    val piped = ExternalPipe.pipePartitions(df, "text", "out",
      Seq("sh", "-c",
        """while IFS= read -r l; do echo "$l"; printf '%0100d\n' 7 >&2; done"""))
    assert(piped.filter($"out" === $"text").count() == 2000)
  }

  test("backpressure: partitions larger than the pending queue still stream") {
    // stdbuf -oL: the queue retains only 64 in-flight rows, so the filter
    // must be line-buffered (a block-buffered tr would wedge at this
    // capacity — the documented buffering caveat)
    val df = (1 to 5000).map(i => (i.toLong, s"row $i")).toDF("id", "text").coalesce(1)
    val piped = ExternalPipe.pipePartitions(df, "text", "out",
      Seq("stdbuf", "-oL", "tr", "a-z", "A-Z"), queueCapacity = 64)
    assert(piped.filter($"out" === upper($"text")).count() == 5000)
  }
}
