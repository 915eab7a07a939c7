package graft.sources.warc

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** `spark.readStream.format("warc").load(crawlDir)` — crawl-watching
  * ingest. A live crawl DELIVERS containers: new `.warc.gz` files appear
  * under the drop directory every few minutes, forever. This stream turns
  * each trigger into "the containers that arrived since the last one",
  * which feeds `StreamOps.streamingIngest` (one signature epoch per
  * micro-batch) without any parquet staging hop.
  *
  * Offset + replay design (the part that has to survive crashes):
  *   - The offset is a plain batch counter (`{"batch": N}`).
  *   - The FILES of batch N are written to
  *     `<checkpoint>/graft-warc-batches/N` BEFORE `latestOffset` returns
  *     N (temp-file + atomic rename), so a replay of any committed range
  *     `(start, end]` — Spark's restart contract — re-reads exactly the
  *     files those batches contained, even though the directory has
  *     grown since. Discovery state (the seen-file set) is itself
  *     rebuilt from these logs on restart, so a crash between our log
  *     write and the engine's offset commit cannot duplicate or drop a
  *     container: the orphaned batch file simply becomes the next offset
  *     returned.
  *   - Files are identified by path + length: a container is only
  *     eligible once it is non-empty, and growth-in-place is not
  *     supported (crawls move files in atomically; document, don't
  *     guess).
  *
  * At-scale shape: discovery is one directory listing per trigger
  * (driver-side, same cost class as Spark's own FileStreamSource);
  * per-batch parallelism is per-container, like the batch reader.
  */
class WarcMicroBatchStream(checkpointLocation: String, rawPaths: Seq[String],
                           fields: Array[String], keepTypes: Set[String],
                           strict: Boolean, maxPartitionBytes: Long,
                           defaultParallelism: Int,
                           conf: Broadcast[SerializableHadoopConf])
    extends MicroBatchStream {

  private val logDir = new HPath(checkpointLocation, "graft-warc-batches")
  private val fs = logDir.getFileSystem(conf.value.value)

  /** Compaction cadence: every N commits the per-batch logs of the
    * committed prefix collapse into one `compact-<batch>` snapshot. A
    * crawl-watch stream runs forever; without compaction the log dir
    * grows one file per trigger and every restart re-reads all of them.
    */
  private val CompactEvery: Long =
    math.max(1L, sys.props.getOrElse("graft.warc.compactEvery", "10").toLong)

  // rebuilt on construction: the newest compact snapshot (one read seeds
  // the whole committed history) plus the uncompacted tail of batch logs
  private val seen = mutable.HashSet.empty[String]
  private var lastBatch: Long = -1L
  private var lastCompacted: Long = -1L
  locally {
    if (fs.exists(logDir)) {
      val sts = fs.listStatus(logDir)
      val compacts = sts.flatMap(st =>
        Option(st.getPath.getName).filter(_.startsWith("compact-"))
          .flatMap(_.stripPrefix("compact-").toLongOption))
      lastCompacted = if (compacts.isEmpty) -1L else compacts.max
      if (lastCompacted >= 0) {
        lastBatch = lastCompacted
        readLog(compactPath(lastCompacted)).foreach { case (f, _) => seen += f }
      }
      sts.foreach { st =>
        val name = st.getPath.getName
        name.toLongOption match {
          case Some(b) =>
            if (b > lastBatch) lastBatch = b
            if (b > lastCompacted) readBatchLog(b).foreach { case (f, _) => seen += f }
            // a crash between compact-write and log-delete leaves logs the
            // snapshot already covers — finish the sweep here
            else fs.delete(st.getPath, false)
          case None =>
            // superseded snapshots and torn temp files from crash windows
            if ((name.startsWith("compact-") &&
                  name.stripPrefix("compact-").toLongOption.exists(_ < lastCompacted)) ||
                (name.startsWith(".") && name.endsWith(".tmp")))
              fs.delete(st.getPath, false)
        }
      }
    } else fs.mkdirs(logDir)
  }

  private def compactPath(batch: Long): HPath =
    new HPath(logDir, s"compact-$batch")

  private def readLog(path: HPath): Seq[(String, Long)] = {
    val in = fs.open(path)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      val txt = new String(bos.toByteArray, UTF_8)
      txt.split('\n').filter(_.nonEmpty).toSeq.map { line =>
        val tab = line.lastIndexOf('\t')
        (line.substring(0, tab), line.substring(tab + 1).toLong)
      }
    } finally in.close()
  }

  private def readBatchLog(batch: Long): Seq[(String, Long)] =
    readLog(new HPath(logDir, batch.toString))

  private def writeLog(target: HPath, files: Seq[(String, Long)]): Unit = {
    val tmp = new HPath(logDir, s".${target.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(files.map { case (f, l) => s"$f\t$l" }.mkString("\n").getBytes(UTF_8))
    finally out.close()
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"warc stream: failed to commit log ${target.getName}")
  }

  private def writeBatchLog(batch: Long, files: Seq[(String, Long)]): Unit =
    writeLog(new HPath(logDir, batch.toString), files)

  override def initialOffset(): Offset = WarcOffset(-1L)
  override def deserializeOffset(json: String): Offset = WarcOffset.fromJson(json)

  override def latestOffset(): Offset = {
    val now = WarcScan.listFiles(rawPaths, conf.value.value, requireMatch = false)
    val fresh = now.filter { case (f, len) => len > 0 && !seen.contains(f) }
    if (fresh.nonEmpty) {
      lastBatch += 1
      writeBatchLog(lastBatch, fresh)
      fresh.foreach { case (f, _) => seen += f }
    }
    WarcOffset(lastBatch)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WarcOffset].batch
    val e = end.asInstanceOf[WarcOffset].batch
    // the bin-pack target is derived from THIS range's files — a stream
    // started on an empty drop dir must not freeze a degenerate target
    val batchFiles = ((s + 1) to e).flatMap(readBatchLog)
    WarcScan.pack(batchFiles,
      WarcScan.targetBytesFor(batchFiles, maxPartitionBytes, defaultParallelism))
      .map(b => WarcInputPartition(b): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(fields, keepTypes, strict, conf)

  /** Batches ≤ `end` are committed — Spark's restart contract replays only
    * ranges ABOVE the committed offset, so their per-batch file lists are
    * never re-planned and can collapse into one snapshot. Every
    * [[CompactEvery]] commits: merge the previous snapshot with the newly
    * committed logs into `compact-<end>` (temp + atomic rename, same as
    * the batch logs), then delete what it supersedes. A crash anywhere in
    * the delete sweep is healed by the constructor's rebuild (it prefers
    * the newest snapshot and sweeps covered files).
    */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[WarcOffset].batch
    if (e < 0 || e - lastCompacted < CompactEvery) return
    val prev =
      if (lastCompacted >= 0) readLog(compactPath(lastCompacted)) else Seq.empty
    val tail = ((lastCompacted + 1) to e).flatMap { b =>
      val p = new HPath(logDir, b.toString)
      if (fs.exists(p)) readLog(p) else Seq.empty
    }
    writeLog(compactPath(e), prev ++ tail)
    ((lastCompacted + 1) to e).foreach(b =>
      fs.delete(new HPath(logDir, b.toString), false))
    if (lastCompacted >= 0) fs.delete(compactPath(lastCompacted), false)
    lastCompacted = e
  }

  override def stop(): Unit = ()
}

case class WarcOffset(batch: Long) extends Offset {
  override def json(): String = s"""{"batch":$batch}"""
}

object WarcOffset {
  private val re = """\{"batch":(-?\d+)\}""".r
  def fromJson(s: String): WarcOffset = s.trim match {
    case re(b) => WarcOffset(b.toLong)
    case other => throw new IllegalArgumentException(s"bad warc offset: $other")
  }
}
