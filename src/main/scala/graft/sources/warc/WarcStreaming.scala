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

  // rebuilt from the batch logs on construction: restart-safe discovery
  private val seen = mutable.HashSet.empty[String]
  private var lastBatch: Long = -1L
  locally {
    if (fs.exists(logDir)) {
      fs.listStatus(logDir).foreach { st =>
        st.getPath.getName.toLongOption.foreach { b =>
          if (b > lastBatch) lastBatch = b
          readBatchLog(b).foreach { case (f, _) => seen += f }
        }
      }
    } else fs.mkdirs(logDir)
  }

  private def readBatchLog(batch: Long): Seq[(String, Long)] = {
    val in = fs.open(new HPath(logDir, batch.toString))
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

  private def writeBatchLog(batch: Long, files: Seq[(String, Long)]): Unit = {
    val tmp = new HPath(logDir, s".${batch}.tmp")
    val out = fs.create(tmp, true)
    try out.write(files.map { case (f, l) => s"$f\t$l" }.mkString("\n").getBytes(UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new HPath(logDir, batch.toString)))
      throw new java.io.IOException(s"warc stream: failed to commit batch log $batch")
  }

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

  override def commit(end: Offset): Unit = ()
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
