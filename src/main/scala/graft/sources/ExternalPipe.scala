package graft.sources

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StringType, StructType}

/** External-process column transform — the faithful analog of the
  * reference's platform shell-out stage (S12: macOS `sips`/`qlmanage`
  * HEIC→PNG conversion, image-deduper `src/platform/macos.rs:53-322`),
  * re-expressed for Spark's execution model: ONE external process per
  * PARTITION (not per row — process spawn is the reference's per-item
  * cost bug), rows streamed through stdin/stdout with bounded-queue
  * backpressure, so executors host the same long-lived filter processes
  * a production extraction sidecar (readability binary, language-ID
  * daemon, bespoke decoder) would be.
  *
  * Contract: `cmd` is a line filter — exactly one output line per input
  * line, in order (`sed`, `tr`, `awk 1`-style). Newlines inside the input
  * column are replaced by spaces before writing (the frame value cannot
  * span lines). A non-zero exit or a line-count mismatch fails the task —
  * loudly, not with silently dropped rows.
  *
  * Buffering caveat (the classic pipe deadlock): the 1:1 zip retains up to
  * `queueCapacity` input rows while their output lines are in flight, so a
  * filter that BLOCK-buffers stdout (glibc default on pipes, ~4-8 KB) must
  * flush within `queueCapacity` lines of lag or the stream wedges — run
  * such filters line-buffered (`stdbuf -oL cmd`) or raise the capacity.
  * Filters that buffer ALL input before any output (`sort`, `tac`) break
  * the in-order contract and cannot be used here at any capacity.
  *
  * This is the engine's ONE `mapPartitions` operator (everything else is
  * Column/Catalyst): imperative per-partition process management is the
  * documented last-resort case.
  */
object ExternalPipe {

  def pipePartitions(df: DataFrame, inCol: String, outCol: String,
                     cmd: Seq[String], queueCapacity: Int = 8192): DataFrame = {
    val inIdx = df.schema.fieldIndex(inCol)
    val outSchema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(outCol, StringType, nullable = true))
    val encoder = Encoders.row(outSchema)
    val cmdList = cmd.toList // serializable capture
    df.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val pb = new ProcessBuilder(cmdList: _*)
        // stderr goes to the executor's own stderr (diagnostics preserved in
        // executor logs). NEVER leave it a pipe: nothing here drains it, so
        // a filter that logs more than the ~64 KB pipe buffer would block on
        // write and wedge the stream. Not redirectErrorStream — merging
        // stderr into stdout would corrupt the one-line-per-row contract.
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val proc = pb.start()
        // pending rows awaiting their output line; capacity bounds the
        // rows held in memory AND provides stdin backpressure when the
        // external filter is slower than the scan
        val pending = new LinkedBlockingQueue[Row](queueCapacity)
        @volatile var writerError: Throwable = null
        val writer = new Thread(() => {
          try {
            val out = new java.io.BufferedWriter(
              new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
            try rows.foreach { r =>
              pending.put(r)
              val v = r.get(inIdx)
              out.write(if (v == null) "" else v.toString.replace('\n', ' ').replace('\r', ' '))
              out.write('\n')
              // flush per line: the NEXT put may block on a full queue, and
              // a line still sitting in this writer's buffer can never be
              // answered — the deadlock would be ours, not the filter's
              out.flush()
            }
            finally out.close()
          } catch { case t: Throwable => writerError = t; proc.destroy() }
        }, "external-pipe-writer")
        writer.setDaemon(true)
        writer.start()

        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))

        // The happy path (iterator drained to EOF) reaps the process above;
        // every OTHER way a task ends — downstream failure, limit/take/show
        // consuming only a prefix, task kill — must not leak the process or
        // leave the writer thread parked on a full queue for the executor's
        // lifetime. The completion listener fires on all of them.
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          proc.destroyForcibly()
          writer.interrupt() // unblock a pending.put() that no one will poll
          try reader.close() catch { case _: java.io.IOException => () }
        }
        new Iterator[Row] {
          private var nextLine: String = null
          private var done = false
          private def advance(): Unit = if (!done && nextLine == null) {
            nextLine = reader.readLine()
            if (nextLine == null) {
              done = true
              writer.join(30000)
              val exit = if (proc.waitFor(30, TimeUnit.SECONDS)) proc.exitValue()
                         else { proc.destroyForcibly(); -1 }
              if (writerError != null)
                throw new java.io.IOException(s"external pipe writer failed", writerError)
              if (exit != 0)
                throw new java.io.IOException(
                  s"external pipe ${cmdList.mkString(" ")} exited with $exit")
              if (!pending.isEmpty)
                throw new java.io.IOException(
                  s"external pipe ${cmdList.mkString(" ")} emitted fewer lines than rows " +
                    s"(${pending.size} rows unanswered)")
            }
          }
          override def hasNext: Boolean = { advance(); nextLine != null }
          override def next(): Row = {
            advance()
            if (nextLine == null) throw new NoSuchElementException
            val row = pending.poll(30, TimeUnit.SECONDS)
            if (row == null)
              throw new java.io.IOException(
                s"external pipe ${cmdList.mkString(" ")} emitted more lines than rows")
            val line = nextLine
            nextLine = null
            Row.fromSeq(row.toSeq :+ line)
          }
        }
      }
    }(encoder).toDF(outSchema.fieldNames: _*)
  }
}
