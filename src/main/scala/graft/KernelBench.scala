package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.LongAdder

import graft.fingerprint.TextExtraction
import graft.pages.PagesGen

/** Pure-JVM microbenchmark for the per-row extraction kernel — no Spark,
  * no shuffle, no scheduler: it isolates (a) the single-thread speedup of
  * the fused single-scan extractor over the regex-pipeline spec and (b)
  * how each kernel scales from 1 to N threads on this box. The pipeline-
  * level ScalingBench measures the whole job and is dominated by
  * co-tenant DRAM-bandwidth noise; this main gives the kernel-level
  * before/after that motivated the fusion (BASELINE.md round-5 scaling
  * diagnosis: the map stage is memory-bandwidth-bound, so copies are the
  * cost).
  *
  * Prints ONE JSON line:
  *   {"metric":"extract_kernel", "docs":N, "threads":[1,T],
  *    "fused_docs_per_sec":[...], "regex_docs_per_sec":[...],
  *    "fused_speedup_1t":x, "fused_thread_scaling":y,
  *    "regex_thread_scaling":z}
  */
object KernelBench {

  private def timeRun(htmls: Array[Array[Byte]], threads: Int,
                      f: Array[Byte] => String): Double = {
    val pool = Executors.newFixedThreadPool(threads)
    val sink = new LongAdder // defeat dead-code elimination
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(threads)
    val n = htmls.length
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    for (t <- 0 until threads) {
      pool.execute { () =>
        try {
          start.await()
          var i = t
          while (i < n) { sink.add(f(htmls(i)).length.toLong); i += threads }
        } catch {
          case e: Throwable => failure.compareAndSet(null, e)
        } finally done.countDown() // never leave done.await() wedged
      }
    }
    val t0 = System.nanoTime()
    start.countDown()
    done.await()
    val sec = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    pool.awaitTermination(10, TimeUnit.SECONDS)
    if (failure.get() != null) throw failure.get()
    require(sink.sum() > 0, "kernel produced no output")
    sec
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON output: decimal points, any host locale
    val docs = sys.env.getOrElse("SPARK_GRAFT_KERNEL_DOCS", "60000").toInt
    val hiThreads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_KERNEL_REPS", "3").toInt

    // deterministic corpus pages, generated once up front (not timed)
    val kinds = PagesGen.variantKinds
    val htmls = Array.tabulate(docs) { i =>
      PagesGen.makePage(11L, i.toLong / kinds.length, kinds(i % kinds.length), 300).html
    }

    // warm up both kernels (JIT) before any timed window
    timeRun(htmls.take(math.min(docs, 5000)), hiThreads, TextExtraction.extract)
    timeRun(htmls.take(math.min(docs, 5000)), hiThreads, TextExtraction.extractViaRegex)

    // TRUE per-rep interleave: alternate fused/regex inside every rep so a
    // co-tenant burst spanning one multi-second window hits both arms
    // alike (all-reps-of-one-arm-first lets a single spike inflate one
    // arm's entire sample, which no median can reject). Bench.median, not
    // sorted(n/2): even rep counts must not report the worse middle run.
    def pairWindow(threads: Int): (Double, Double) = {
      val runs = (1 to reps).map { _ =>
        (timeRun(htmls, threads, TextExtraction.extract),
          timeRun(htmls, threads, TextExtraction.extractViaRegex))
      }
      (Bench.median(runs.map(_._1)), Bench.median(runs.map(_._2)))
    }
    val (fused1, regex1) = pairWindow(1)
    val (fusedN, regexN) = pairWindow(hiThreads)

    def rate(sec: Double) = docs / sec
    val json =
      s"""{"metric":"extract_kernel","docs":$docs,"reps":$reps,""" +
        s""""threads":[1,$hiThreads],""" +
        f""""fused_docs_per_sec":[${rate(fused1)}%.0f,${rate(fusedN)}%.0f],""" +
        f""""regex_docs_per_sec":[${rate(regex1)}%.0f,${rate(regexN)}%.0f],""" +
        f""""fused_speedup_1t":${regex1 / fused1}%.2f,""" +
        f""""fused_speedup_${hiThreads}t":${regexN / fusedN}%.2f,""" +
        f""""fused_thread_scaling":${rate(fusedN) / rate(fused1) / hiThreads}%.3f,""" +
        f""""regex_thread_scaling":${rate(regexN) / rate(regex1) / hiThreads}%.3f}"""
    // scalastyle:off println
    println(json)
    // scalastyle:on println
  }
}
