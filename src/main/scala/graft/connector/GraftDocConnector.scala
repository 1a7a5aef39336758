package graft.connector

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.graft.docjson
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-doc`: a DataSource V2 keyed JSON-document table with
  * upsert-by-`_id` semantics — the engine's re-expression of the
  * reference's keyed document sink (`MapRDBJSONSink.java:96,102-146`,
  * `com.mapr.db.mapreduce.TableOutputFormat`: every record becomes a JSON
  * document whose `_id` is the configured key; re-writing an `_id`
  * replaces the document, which is what upgrades the source's
  * at-least-once delivery to exactly-once table contents).
  *
  * A KV store resolves upsert on write; a file-backed table can't mutate,
  * so this connector uses the standard log-structured design (merge-on-read
  * with base/delta commits — the same shape as public lakehouse formats):
  *
  *  - every write lands as an immutable `commit_<seq>_<uuid>/` directory
  *    of JSON-line part files (task writers → `_staging/`, atomic driver
  *    rename on commit — files never appear partially);
  *  - the scan exposes every document version plus a `_commit` column;
  *  - [[GraftDoc.snapshot]] resolves latest-document-per-`_id` (one
  *    hash shuffle on `_id`, the minimum any upsert resolution costs);
  *  - [[GraftDoc.compact]] folds history into a single base commit so
  *    read amplification stays bounded.
  *
  * Streaming writes are idempotent per `(queryId, epochId)` — a replayed
  * micro-batch (at-least-once source) finds its manifest already
  * committed and becomes a no-op, giving exactly-once table contents:
  * the reference's idempotence argument, made explicit in the commit
  * protocol instead of relying on store-side put semantics.
  *
  * Scale: writers are per-task and roll files at `targetFileRows` (no
  * shuffle for small-files control); commit is an O(#files) driver
  * rename; the scan prunes columns (JSON parser skips unrequested
  * fields) and parallelizes per file. Executors obtain the FileSystem
  * from the Hadoop classpath configuration — the same mechanism as any
  * Hadoop OutputFormat, so `file://`, `hdfs://`, object stores all work.
  */
class GraftDocDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-doc"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = GraftDocLog.requirePath(options)
    val doc = GraftDocLog.readSchema(path).getOrElse(throw new IllegalArgumentException(
      s"graft-doc: no ${GraftDocLog.SchemaFile} under $path and no user schema " +
        "(pass .schema(...) or write the table first)"))
    // reads expose the commit sequence alongside the document fields —
    // the recency column GraftDoc.snapshot resolves upserts with
    doc.add(StructField(GraftDocLog.CommitCol, LongType, nullable = false))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftDocTable(schema,
      GraftDocLog.requirePath(new CaseInsensitiveStringMap(properties)))
}

class GraftDocTable(docSchema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-doc:$path"
  override def schema(): StructType = docSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDocScanBuilder(docSchema, path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    GraftDocLog.validateWriteSchema(info.schema())
    new GraftDocWriteBuilder(info, path)
  }
}

// ---------------------------------------------------------------- read side

class GraftDocScanBuilder(docSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  // table schema already carries _commit when it came from inferSchema;
  // add it if the caller handed a bare document schema
  private val fullSchema =
    if (docSchema.fieldNames.contains(GraftDocLog.CommitCol)) docSchema
    else docSchema.add(StructField(GraftDocLog.CommitCol, LongType, nullable = false))
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] =
      GraftDocLog.listCommitFiles(path).map { case (seq, file) =>
        GraftDocInputPartition(file, seq): InputPartition
      }.toArray

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftDocReaderFactory(required.json)
  }
}

case class GraftDocInputPartition(file: String, commitSeq: Long) extends InputPartition

class GraftDocReaderFactory(requiredSchemaJson: String)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftDocInputPartition]
    val required = graft.connector.GraftDocLog.schemaFromJson(requiredSchemaJson)
    // parse only the document fields Spark asked for (JSON column pruning:
    // the parser skips every other key), then place them — plus _commit —
    // in Spark's required order.
    val docPart = StructType(required.filter(_.name != GraftDocLog.CommitCol))
    val docIndex = docPart.fieldNames.zipWithIndex.toMap
    val outPlan: Array[Int] = // >=0: doc field index; -1: _commit
      required.fields.map(f => docIndex.getOrElse(f.name, -1))

    new PartitionReader[InternalRow] {
      private val fs = new Path(p.file).getFileSystem(new Configuration())
      private val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(new Path(p.file)), "UTF-8"))
      private val parser = new docjson.RowJsonReader(docPart)
      private var pending: Iterator[InternalRow] = Iterator.empty
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (!pending.hasNext) {
          val line = in.readLine()
          if (line == null) return false
          if (line.nonEmpty) pending = parser.fromJson(line)
        }
        val doc = pending.next()
        val out = new GenericInternalRow(outPlan.length)
        var i = 0
        while (i < outPlan.length) {
          out.update(i,
            if (outPlan(i) < 0) p.commitSeq
            else if (doc.isNullAt(outPlan(i))) null
            else doc.get(outPlan(i), docPart.fields(outPlan(i)).dataType))
          i += 1
        }
        current = out
        true
      }

      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}

// --------------------------------------------------------------- write side

class GraftDocWriteBuilder(info: LogicalWriteInfo, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new Write {
    private val targetFileRows =
      Option(info.options.get(GraftDocLog.TargetFileRowsOpt)).map(_.toLong)

    override def toBatch: BatchWrite = new BatchWrite {
      private val writeId = UUID.randomUUID().toString

      override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DataWriterFactory =
        new GraftDocWriterFactory(
          GraftDocLog.stagingDir(path, writeId), info.schema().json, targetFileRows)

      override def commit(messages: Array[WriterCommitMessage]): Unit =
        GraftDocLog.finalizeCommit(path, GraftDocLog.stagingDir(path, writeId),
          info.schema(), info.queryId(), epochId = -1L, truncateFirst)

      override def abort(messages: Array[WriterCommitMessage]): Unit =
        GraftDocLog.deleteDir(GraftDocLog.stagingDir(path, writeId))
    }

    override def toStreaming: StreamingWrite = new StreamingWrite {
      private val writeId = UUID.randomUUID().toString
      private def epochDir(epochId: Long) =
        s"${GraftDocLog.stagingDir(path, writeId)}/epoch_$epochId"

      override def createStreamingWriterFactory(pInfo: PhysicalWriteInfo): StreamingDataWriterFactory =
        new GraftDocStreamingWriterFactory(
          GraftDocLog.stagingDir(path, writeId), info.schema().json, targetFileRows)

      // Idempotent per (queryId, epochId): a replayed micro-batch finds its
      // manifest already in the log and is dropped — exactly-once contents
      // over an at-least-once source.
      override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        GraftDocLog.finalizeCommit(path, epochDir(epochId), info.schema(),
          info.queryId(), epochId, truncateFirst = false)

      override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        GraftDocLog.deleteDir(epochDir(epochId))
    }
  }
}

class GraftDocWriterFactory(stagingDir: String, schemaJson: String,
    targetFileRows: Option[Long]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDocDataWriter(stagingDir, partitionId, taskId, schemaJson, targetFileRows)
}

class GraftDocStreamingWriterFactory(stagingDir: String, schemaJson: String,
    targetFileRows: Option[Long]) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftDocDataWriter(s"$stagingDir/epoch_$epochId", partitionId, taskId,
      schemaJson, targetFileRows)
}

/** Task-side writer: serializes rows to JSON lines, rolling to a new part
  * file every `targetFileRows` rows (small-files/large-files control with
  * zero shuffle — the file boundary is task-local). */
class GraftDocDataWriter(stagingDir: String, partitionId: Int, taskId: Long,
    schemaJson: String, targetFileRows: Option[Long])
    extends DataWriter[InternalRow] {

  private val schema = graft.connector.GraftDocLog.schemaFromJson(schemaJson)
  private val json = new docjson.RowJsonWriter(schema)
  private val fs = new Path(stagingDir).getFileSystem(new Configuration())
  private var out: java.io.BufferedWriter = _
  private var fileIdx = 0
  private var rowsInFile = 0L
  private var totalRows = 0L
  private val written = scala.collection.mutable.ArrayBuffer.empty[Path]

  private def roll(): Unit = {
    if (out != null) out.close()
    val f = new Path(stagingDir,
      f"part-$partitionId%05d-$taskId-$fileIdx%04d.jsonl")
    written += f
    out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(fs.create(f, true), "UTF-8"))
    fileIdx += 1
    rowsInFile = 0L
  }

  override def write(row: InternalRow): Unit = {
    if (out == null || targetFileRows.exists(rowsInFile >= _)) roll()
    out.write(json.toJson(row))
    out.write('\n')
    rowsInFile += 1
    totalRows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    json.close()
    GraftDocCommitMessage(totalRows)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    written.foreach(fs.delete(_, false))
  }

  override def close(): Unit = ()
}

case class GraftDocCommitMessage(rows: Long) extends WriterCommitMessage

// ------------------------------------------------------------- log protocol

/** Driver-side commit-log operations for graft-doc tables. */
object GraftDocLog {
  /** Public-API replacement for the `private[sql]` `StructType.fromString`. */
  def schemaFromJson(json: String): StructType =
    org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType]

  val CommitCol = "_commit"
  val SchemaFile = "_schema.json"
  val ManifestFile = "_manifest.json"
  val TargetFileRowsOpt = "targetFileRows"
  private val CommitRe = "commit_([0-9]{9})_.*".r

  def requirePath(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-doc: path option required"))

  /** W3 sink-schema validation (reference `MapRDBJSONSinkConfig` key
    * checks): a keyed-document write needs a leading string `_id`. */
  def validateWriteSchema(schema: StructType): Unit = {
    require(schema.fields.nonEmpty, "graft-doc: empty write schema")
    require(schema.fields.head.name == "_id" && schema.fields.head.dataType == StringType,
      s"graft-doc: first write column must be `_id` STRING (the document key); " +
        s"got ${schema.fields.head.name}: ${schema.fields.head.dataType.simpleString}. " +
        "Use GraftDoc.write/DocumentSink.toDocuments to hoist a key field.")
  }

  private def fsFor(p: String): (FileSystem, Path) = {
    val hp = new Path(p)
    (hp.getFileSystem(new Configuration()), hp)
  }

  def stagingDir(tablePath: String, writeId: String): String =
    s"$tablePath/_staging/$writeId"

  def deleteDir(dir: String): Unit = {
    val (fs, p) = fsFor(dir)
    fs.delete(p, true)
  }

  def readSchema(tablePath: String): Option[StructType] = {
    val (fs, p) = fsFor(s"$tablePath/$SchemaFile")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(graft.connector.GraftDocLog.schemaFromJson(
        new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)))
      finally in.close()
    }
  }

  /** (commitSeq, file) for every part file in the log, commit order. */
  def listCommitFiles(tablePath: String): Seq[(Long, String)] = {
    val (fs, root) = fsFor(tablePath)
    if (!fs.exists(root)) return Seq.empty
    commitDirs(fs, root).flatMap { case (seq, dir) =>
      fs.listStatus(dir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".jsonl"))
        .map(s => seq -> s.getPath.toString)
    }
  }

  private def commitDirs(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    fs.listStatus(root).toSeq.collect {
      case s if s.isDirectory =>
        s.getPath.getName match {
          case CommitRe(seq) => Some(seq.toLong -> s.getPath)
          case _ => None
        }
    }.flatten.sortBy(_._1)

  private def writeFile(fs: FileSystem, p: Path, content: String,
      overwrite: Boolean): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Atomically publish a staged write as the next commit.
    *
    * Single-writer-per-table protocol (like the reference's single sink
    * job per table): seq assignment is driver-side; concurrent writers
    * would need a lock/log service on top, which the layout permits but
    * this round does not ship.
    */
  def finalizeCommit(tablePath: String, stagingDir: String, schema: StructType,
      queryId: String, epochId: Long, truncateFirst: Boolean): Unit = synchronized {
    val (fs, root) = fsFor(tablePath)
    val staging = new Path(stagingDir)
    fs.mkdirs(staging) // zero-row writes still commit (empty batch is a commit)

    if (epochId >= 0 && committedEpochs(fs, root).contains((queryId, epochId))) {
      fs.delete(staging, true) // replayed micro-batch: already in the log
      return
    }
    if (truncateFirst)
      commitDirs(fs, root).foreach { case (_, d) => fs.delete(d, true) }

    // schema stability across commits: an append whose fields differ from
    // the table's recorded schema would silently corrupt every later read
    // (the scan parses documents with the recorded schema), so reject it
    // here — the write-side schema validation the reference performs at
    // configure time (W3), enforced at the log boundary.
    val schemaPathCheck = new Path(root, SchemaFile)
    if (!truncateFirst && fs.exists(schemaPathCheck)) {
      val recorded = schemaFromJson(readFile(fs, schemaPathCheck))
      val rec = recorded.fields.map(f => f.name -> f.dataType).toSeq
      val got = schema.fields.map(f => f.name -> f.dataType).toSeq
      if (rec != got) {
        fs.delete(staging, true)
        throw new IllegalArgumentException(
          s"graft-doc: append schema ${schema.simpleString} does not match " +
            s"table schema ${recorded.simpleString} at $tablePath " +
            "(overwrite to redefine the table)")
      }
    } else if (truncateFirst && fs.exists(schemaPathCheck)) {
      fs.delete(schemaPathCheck, false) // truncate redefines the table schema
    }

    val seq = commitDirs(fs, root).lastOption.map(_._1).getOrElse(0L) + 1
    writeFile(fs, new Path(staging, ManifestFile),
      s"""{"queryId":"$queryId","epochId":$epochId}""", overwrite = true)
    val schemaPath = new Path(root, SchemaFile)
    if (!fs.exists(schemaPath))
      writeFile(fs, schemaPath, schema.json, overwrite = false)
    val target = new Path(root, f"commit_$seq%09d_${staging.getName}")
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"graft-doc: commit rename failed: $staging -> $target")
    // prune an empty _staging/<writeId> parent left by streaming epochs
    val parent = staging.getParent
    if (parent.getName != "_staging" && fs.exists(parent) &&
        fs.listStatus(parent).isEmpty) fs.delete(parent, false)
  }

  private def committedEpochs(fs: FileSystem, root: Path): Set[(String, Long)] =
    commitDirs(fs, root).flatMap { case (_, dir) =>
      val m = new Path(dir, ManifestFile)
      if (!fs.exists(m)) None
      else {
        val txt = readFile(fs, m)
        val q = "\"queryId\":\"([^\"]*)\"".r.findFirstMatchIn(txt).map(_.group(1))
        val e = "\"epochId\":(-?[0-9]+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
        for (qq <- q; ee <- e if ee >= 0) yield (qq, ee)
      }
    }.toSet

  /** Drop every commit strictly below `keepFrom` (compaction cleanup). */
  def dropCommitsBelow(tablePath: String, keepFrom: Long): Unit = {
    val (fs, root) = fsFor(tablePath)
    commitDirs(fs, root).filter(_._1 < keepFrom)
      .foreach { case (_, d) => fs.delete(d, true) }
  }

  def latestCommitSeq(tablePath: String): Long = {
    val (fs, root) = fsFor(tablePath)
    if (!fs.exists(root)) 0L
    else commitDirs(fs, root).lastOption.map(_._1).getOrElse(0L)
  }
}
