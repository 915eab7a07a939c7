package graft.sources.warc

import java.util.OptionalLong

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Hadoop `Configuration` is Writable, not Serializable; this wrapper
  * ships the driver's session conf to executors (credentials, fs.* keys)
  * so `FileSystem.get` resolves the same way on both sides. (Spark's own
  * `SerializableConfiguration` is `private[spark]`.)
  */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = value.write(out)
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

/** `spark.read.format("warc")` — DataSource V2 reader for WARC containers,
  * the format Common-Crawl-style corpora actually arrive in. This is the
  * ingest step UPSTREAM of the `pages` table: `WarcIO.pages` projects the
  * source's rows straight into the engine's input shape
  * (url, warc_ts, html), after which extraction/fingerprinting proceed
  * identically to parquet- or Iceberg-fed runs.
  *
  * Scale shape: gzip WARCs are not splittable (no record index, and the
  * member boundaries are only discoverable by decompressing), so the unit
  * of parallelism is the FILE — exactly how the format is deployed: a
  * crawl ships as ~10^4–10^5 files of ~1 GB, which is more partitions
  * than any cluster has slots. Whole containers are bin-packed into
  * `InputPartition`s by the maxSplitBytes rule (big files get a task
  * each; a tiny-file drop coalesces); records stream through a
  * fixed-size window (never a whole-file buffer), so a 1 GB container
  * costs one record's memory at a time.
  *
  * Spark-first surface: column pruning is pushed into the reader
  * (`SupportsPushDownRequiredColumns`) — a `select(url)` run never scans
  * record blocks for HTTP payloads or copies body bytes (the container
  * still forces reading the block's bytes to find the next record, which
  * is a property of the format, not the plan). File sizes feed
  * `SupportsReportStatistics` so Catalyst sees a real `sizeInBytes`
  * instead of defaulting to "huge" (this keeps a small WARC side input
  * broadcastable).
  *
  * Reference analog: the discovery front door
  * (image-deduper `crates/core/src/discovery/mod.rs:16-109`) — directory
  * fan-out ≙ file listing here; per-format decode dispatch
  * (`file_processing.rs:15-41`) ≙ the record-type/HTTP split.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WarcTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new WarcTable(new CaseInsensitiveStringMap(properties))
}

object WarcTable {
  val schema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("content_type", StringType),
    StructField("http_status", IntegerType),
    StructField("rec_type", StringType),
    StructField("warc_file", StringType),
    StructField("rec_index", LongType)))
}

class WarcTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"warc(${options.get("path")})"
  override def schema(): StructType = WarcTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(caseInsensitiveOptions)
}

class WarcScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcTable.schema

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = {
    val spark = SparkSession.active
    val paths = WarcScan.pathsOf(options)
    require(paths.nonEmpty, "warc source needs a path: spark.read.format(\"warc\").load(dir)")
    val conf = spark.sessionState.newHadoopConf()
    val keepTypes = Option(options.get("keeptypes")).getOrElse("response")
      .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
    val strict = options.getBoolean("strict", false)
    WarcScan(paths, required, keepTypes, strict,
      spark.sessionState.conf.filesMaxPartitionBytes,
      spark.sparkContext.defaultParallelism,
      spark.sparkContext.broadcast(new SerializableHadoopConf(conf)))
  }
}

object WarcScan {
  /** Per-file scheduling overhead stand-in — Spark's
    * `spark.sql.files.openCostInBytes` default.
    */
  private[warc] val OpenCostBytes = 4L * 1024 * 1024

  /** `FileSourceScanExec.maxSplitBytes` logic, minus splitting (whole
    * files only): aim for `defaultParallelism` bins unless that would
    * exceed maxPartitionBytes.
    */
  def targetBytesFor(files: Seq[(String, Long)], maxPartitionBytes: Long,
                     defaultParallelism: Int): Long = {
    val total = files.map(_._2 + OpenCostBytes).sum
    val perCore = total / math.max(defaultParallelism, 1)
    math.min(maxPartitionBytes, math.max(OpenCostBytes, perCore))
  }

  /** Greedy first-fit-decreasing bin-pack of whole containers. Large
    * files (≥ target) get their own bin — they cannot split; the tail of
    * small files coalesces so a 50k-tiny-file drop does not become 50k
    * tasks.
    */
  def pack(files: Seq[(String, Long)], targetBytes: Long): Seq[Seq[(String, Long)]] = {
    val sorted = files.sortBy { case (f, len) => (-len, f) }
    val bins = ArrayBuffer.empty[Seq[(String, Long)]]
    var cur = ArrayBuffer.empty[(String, Long)]
    var curSz = 0L
    sorted.foreach { case f @ (_, len) =>
      val cost = math.max(len, OpenCostBytes)
      if (cur.nonEmpty && curSz + cost > targetBytes) {
        bins += cur.toSeq
        cur = ArrayBuffer.empty
        curSz = 0L
      }
      cur += f
      curSz += cost
    }
    if (cur.nonEmpty) bins += cur.toSeq
    bins.toSeq
  }

  private[warc] def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    // DataFrameReader.load(p1, p2, ...) ships a JSON string array — parse
    // it as JSON (Jackson ships with Spark): a regex over the raw text
    // would keep escape sequences verbatim, so a path containing a quote
    // or backslash would list as a path that does not exist
    val multi = Option(options.get("paths")).toSeq.flatMap { js =>
      try {
        import scala.jdk.CollectionConverters._
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(js)
        if (node != null && node.isArray) node.elements().asScala.map(_.asText()).toSeq
        else Seq.empty
      } catch { case scala.util.control.NonFatal(_) => Seq.empty }
    }
    (single ++ multi).filter(_.nonEmpty)
  }

  /** `requireMatch = false` is the crawl-watch posture: a drop directory
    * that does not exist YET yields an empty listing (the stream keeps
    * polling); a batch read of a path matching nothing stays a loud error.
    */
  private[warc] def listFiles(paths: Seq[String],
                              conf: org.apache.hadoop.conf.Configuration,
                              requireMatch: Boolean = true): Seq[(String, Long)] = {
    val out = ArrayBuffer.empty[(String, Long)]
    paths.foreach { p =>
      val hp = new HPath(p)
      val fs = hp.getFileSystem(conf)
      val matches = Option(fs.globStatus(hp)).getOrElse(Array.empty)
      require(!requireMatch || matches.nonEmpty, s"warc path matches nothing: $p")
      matches.foreach { st =>
        if (st.isDirectory) {
          val it = fs.listFiles(st.getPath, true)
          while (it.hasNext) {
            val f = it.next()
            val n = f.getPath.getName
            if (n.endsWith(".warc") || n.endsWith(".warc.gz"))
              out += ((f.getPath.toString, f.getLen))
          }
        } else out += ((st.getPath.toString, st.getLen))
      }
    }
    out.sortBy(_._1).toSeq
  }
}

/** One read task: a bin of whole containers (gzip WARCs can't split, so
  * the bin-packing direction is SMALL files — a drop of 50k tiny
  * containers must not schedule 50k tasks).
  */
case class WarcInputPartition(files: Seq[(String, Long)]) extends InputPartition

case class WarcScan(rawPaths: Seq[String], required: StructType,
                    keepTypes: Set[String], strict: Boolean,
                    maxPartitionBytes: Long, defaultParallelism: Int,
                    conf: Broadcast[SerializableHadoopConf])
    extends Scan with Batch with SupportsReportStatistics {

  // listing is deferred past build(): the BATCH path demands the paths
  // match something (and lists exactly once, here); the STREAMING path
  // never touches this — a crawl-watch stream may legally start on a drop
  // directory that does not exist yet, and its listing happens per trigger
  private lazy val files: Seq[(String, Long)] =
    WarcScan.listFiles(rawPaths, conf.value.value)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatchStream(checkpointLocation, rawPaths, required.fieldNames,
      keepTypes, strict, maxPartitionBytes, defaultParallelism, conf)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"warc(${rawPaths.mkString(",")}, keep=${keepTypes.mkString("+")})"

  override def planInputPartitions(): Array[InputPartition] =
    WarcScan.pack(files,
      WarcScan.targetBytesFor(files, maxPartitionBytes, defaultParallelism))
      .map(b => WarcInputPartition(b): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required.fieldNames, keepTypes, strict, conf)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.of(files.map(_._2).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

case class WarcReaderFactory(fields: Array[String], keepTypes: Set[String],
                             strict: Boolean, conf: Broadcast[SerializableHadoopConf])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WarcInputPartition]
    new WarcPartitionReader(p.files, fields, keepTypes, strict, conf.value.value)
  }
}

/** Streams one WARC file; builds only the pruned columns. The HTTP
  * payload split (status-line scan + body copy) runs only when a
  * payload-derived column (html / http_status / content_type) survived
  * pruning, and only for `response` records.
  */
class WarcPartitionReader(files: Seq[(String, Long)], fields: Array[String],
                          keepTypes: Set[String], strict: Boolean,
                          conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val needHttp =
    fields.exists(f => f == "html" || f == "http_status" || f == "content_type")
  // status/content_type need only the header split; copying every page
  // body in a metadata-only scan would double-allocate the whole corpus
  private val needBody = fields.contains("html")
  private var fileUtf8: UTF8String = _

  private var fileIdx = -1
  private var raw: java.io.InputStream = null
  private var it: Warc.RecordIterator = null
  private var row: InternalRow = _

  private def closeCurrent(): Unit = {
    // close the iterator FIRST: for gzip containers it owns the
    // GZIPInputStream whose close() is the only release of the native
    // zlib Inflater (the raw close alone would leak it until GC)
    if (it != null) {
      try it.close() catch { case _: java.io.IOException => () }
      it = null
    }
    if (raw != null) { raw.close(); raw = null }
  }

  private def openNextFile(): Boolean = {
    closeCurrent()
    fileIdx += 1
    if (fileIdx >= files.length) return false
    val hp = new HPath(files(fileIdx)._1)
    fileUtf8 = UTF8String.fromString(files(fileIdx)._1)
    raw = hp.getFileSystem(conf).open(hp)
    it = Warc.records(raw, hp.getName, strict)
    true
  }

  override def next(): Boolean = {
    row = null
    while (row == null) {
      if (it == null || !it.hasNext) {
        if (!openNextFile()) return false
      } else {
        val rec = it.next()
        if (keepTypes.contains(rec.recType)) row = build(rec)
      }
    }
    true
  }

  private def build(rec: Warc.Record): InternalRow = {
    val http =
      if (needHttp && rec.recType == "response")
        Warc.parseHttp(rec.block, withBody = needBody)
      else null
    val vals = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      vals(i) = fields(i) match {
        case "url"          => if (rec.targetUri == null) null else UTF8String.fromString(rec.targetUri)
        case "warc_ts"      => rec.dateMicros
        case "html"         => if (http != null) http.body else rec.block
        case "content_type" =>
          val ct = if (http != null && http.contentType != null) http.contentType else rec.contentType
          if (ct == null) null else UTF8String.fromString(ct)
        case "http_status"  => if (http == null) null else http.status
        case "rec_type"     => UTF8String.fromString(rec.recType)
        case "warc_file"    => fileUtf8
        case "rec_index"    => rec.index
        case other          => throw new IllegalArgumentException(s"unknown warc column $other")
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def get(): InternalRow = row
  override def close(): Unit = closeCurrent()
}

/** User-facing helpers: the reader plus the projection into the engine's
  * `pages` input shape.
  */
object WarcIO {
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("warc").load(path)

  /** WARC → the pages input frame (url, warc_ts, html). Rows without a
    * target URI (warcinfo was already dropped by the type filter; some
    * crawlers emit uri-less conversion records) are quarantined out here,
    * matching F6's null-check posture.
    */
  def pages(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    read(spark, path)
      .select(col("url"), col("warc_ts"), col("html"))
      .filter(col("url").isNotNull)
  }
}
