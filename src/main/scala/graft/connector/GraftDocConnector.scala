package graft.connector

import java.util.UUID
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.graft.docjson
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

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
  *    rename on commit — files never appear partially); the sequence
  *    number is claimed through an atomic create of a `_claim_<seq>`
  *    marker, so CONCURRENT writers (separate drivers) race on the claim
  *    and the loser re-seqs and retries — both commits survive;
  *  - every part file's row count and `_id` min/max land in the commit
  *    manifest, giving the scan file-level skipping for `_id` and
  *    `_commit` predicates (the reference store's point-read-by-key
  *    semantics, `MapRDBJSONSink.java:96,140-146`, re-expressed as
  *    pushdown + pruning);
  *  - the scan exposes every document version plus a `_commit` column,
  *    splits large files into byte-range partitions (newline-aligned, the
  *    classic text-split protocol) so a few big commits still parallelize;
  *  - [[GraftDoc.snapshot]] resolves latest-document-per-`_id` (one
  *    hash shuffle on `_id`, the minimum any upsert resolution costs);
  *  - [[GraftDoc.compact]] folds history into a single base commit so
  *    read amplification stays bounded.
  *
  * Streaming writes are idempotent per `(queryId, epochId)`: each query's
  * committed-epoch HIGH WATERMARK lives in `_epochs/<queryId>` and is read
  * in O(1) per commit — not by scanning every manifest (which would be
  * O(#commits) reads per commit, a long-running-stream killer on object
  * stores). The manifest still records (queryId, epochId) as the crash-
  * consistent source of truth: if the watermark file is missing or stale
  * (crash between commit rename and watermark update), the commit path
  * falls back to scanning only the manifests ABOVE the recorded watermark
  * seq — normally zero files. `_epochs/` lives outside the commit dirs,
  * so replay protection survives [[GraftDoc.compact]] folding manifests.
  *
  * All FileSystem access uses the Spark session's Hadoop configuration
  * (driver: `sessionState.newHadoopConf()`; tasks: the same conf shipped
  * inside the serialized reader/writer factories), so `spark.hadoop.*`
  * settings — object-store credentials, endpoints, custom FS impls —
  * apply to the table path exactly as they do to any Spark data source.
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
    val withCommit =
      doc.add(StructField(GraftDocLog.CommitCol, LongType, nullable = false))
    // opt-in `_op` change-type column (insert|delete): first-class CDC
    // deletes — the flag rides the commit dir name, so it costs the scan
    // nothing (no manifest read, no per-row storage)
    if (options.getBoolean(GraftDocLog.WithOpOpt, false))
      withCommit.add(StructField(GraftDocLog.OpCol, StringType, nullable = false))
    else withCommit
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
      TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDocScanBuilder(docSchema, path, GraftDocReadConf.from(options))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    GraftDocLog.validateWriteSchema(info.schema())
    new GraftDocWriteBuilder(info, path)
  }
}

// ---------------------------------------------------------------- read side

/** Hadoop Configuration with Java serialization, so task-side readers and
  * writers see the driver session's `spark.hadoop.*` settings (the
  * standard DSv2 pattern; Spark's own SerializableConfiguration is
  * `private[spark]`). */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Read-side options, resolved once at scan-builder construction. */
private[connector] case class GraftDocReadConf(
    splitBytes: Long,
    maxCommitsPerTrigger: Option[Long],
    maxRowsPerTrigger: Option[Long],
    maxFilesPerTrigger: Option[Long],
    claimGraceMs: Long)

private[connector] object GraftDocReadConf {
  def from(options: CaseInsensitiveStringMap): GraftDocReadConf = {
    val grace =
      options.getLong(GraftDocLog.ClaimGraceMsOpt, GraftDocLog.DefaultClaimGraceMs)
    // The fence invariant is code, not convention: readers stepping over
    // claims sooner than 2× the writer fence reopen the skipped-forever
    // window the fence closed (a fenced writer may legitimately rename up
    // to fence ms after claiming). Raising the grace is always safe;
    // lowering it below the invariant is rejected at option-resolution
    // time rather than surfacing as silent data loss under clock skew.
    require(grace >= 2 * GraftDocLog.writerFenceMs,
      s"${GraftDocLog.ClaimGraceMsOpt}=$grace ms is below twice the writer " +
        s"fence (${GraftDocLog.writerFenceMs} ms); a reader could step over " +
        "a live claim whose rename still lands. Raise the option (or lower " +
        "the fence in tests).")
    GraftDocReadConf(
      options.getLong(GraftDocLog.MaxSplitBytesOpt, GraftDocLog.DefaultSplitBytes),
      Option(options.get(GraftDocLog.MaxCommitsPerTriggerOpt)).map(_.toLong),
      Option(options.get(GraftDocLog.MaxRowsPerTriggerOpt)).map(_.toLong),
      Option(options.get(GraftDocLog.MaxFilesPerTriggerOpt)).map(_.toLong),
      grace)
  }

  val default: GraftDocReadConf = GraftDocReadConf(
    GraftDocLog.DefaultSplitBytes, None, None, None,
    GraftDocLog.DefaultClaimGraceMs)
}

class GraftDocScanBuilder(docSchema: StructType, path: String,
    readConf: GraftDocReadConf = GraftDocReadConf.default)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  // table schema already carries _commit when it came from inferSchema;
  // add it if the caller handed a bare document schema
  private val fullSchema =
    if (docSchema.fieldNames.contains(GraftDocLog.CommitCol)) docSchema
    else docSchema.add(StructField(GraftDocLog.CommitCol, LongType, nullable = false))
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** `_id` and `_commit` predicates prune whole files (manifest min/max
    * for `_id`, the partition's own sequence for `_commit`). All filters
    * are returned as residual — Spark re-evaluates them post-scan (the
    * Parquet contract), so pruning is a pure optimization that can never
    * change results. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftDocFilters.supported)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new GraftDocScan(required, path, pushed,
      new SerializableHadoopConf(GraftDocLog.hadoopConf()), readConf)
}

/** Conjunctive file-level pruning over the pushed filter set. */
private[connector] object GraftDocFilters {
  private val Id = "_id"

  // range predicates on ANY single column are accepted: `_id`/`_commit`
  // prune against their dedicated stats, and a payload column prunes
  // against the manifest's declared-column min/max when the writer
  // recorded them (files without stats for the column always pass —
  // all filters are returned residual, so acceptance is never wrong)
  def supported(f: Filter): Boolean = f match {
    case EqualTo(_, _) => true
    case In(_, _) => true
    case GreaterThan(_, _) => true
    case GreaterThanOrEqual(_, _) => true
    case LessThan(_, _) => true
    case LessThanOrEqual(_, _) => true
    case StringStartsWith(c, _) => c == Id // key-prefix scan (reference store range read)
    case _ => false
  }

  private def asLong(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  /** Binary (UTF-8 byte) string order — the order Spark's own string
    * comparisons use, and the order the writer computes min/max in. */
  private def cmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  def commitOk(filters: Array[Filter], seq: Long): Boolean = filters.forall {
    case EqualTo(GraftDocLog.CommitCol, v) => asLong(v).forall(_ == seq)
    case In(GraftDocLog.CommitCol, vs) => vs.exists(v => asLong(v).forall(_ == seq))
    case GreaterThan(GraftDocLog.CommitCol, v) => asLong(v).forall(seq > _)
    case GreaterThanOrEqual(GraftDocLog.CommitCol, v) => asLong(v).forall(seq >= _)
    case LessThan(GraftDocLog.CommitCol, v) => asLong(v).forall(seq < _)
    case LessThanOrEqual(GraftDocLog.CommitCol, v) => asLong(v).forall(seq <= _)
    case _ => true
  }

  /** File passes when every `_id` predicate can hold somewhere inside the
    * file's [minId, maxId] range; files with no recorded stats always
    * pass. */
  def idOk(filters: Array[Filter], minId: Option[String],
      maxId: Option[String]): Boolean = (minId, maxId) match {
    case (Some(mn), Some(mx)) => filters.forall {
      case EqualTo(Id, v: String) => cmp(v, mn) >= 0 && cmp(v, mx) <= 0
      case In(Id, vs) => vs.exists {
        case v: String => cmp(v, mn) >= 0 && cmp(v, mx) <= 0
        case _ => true
      }
      case GreaterThan(Id, v: String) => cmp(mx, v) > 0
      case GreaterThanOrEqual(Id, v: String) => cmp(mx, v) >= 0
      case LessThan(Id, v: String) => cmp(mn, v) < 0
      case LessThanOrEqual(Id, v: String) => cmp(mn, v) <= 0
      // ids with prefix p form [p, succ(p)) in binary order: a file
      // overlaps iff mx >= p and mn is below that interval's end —
      // i.e. mn < p or mn itself carries the prefix
      case StringStartsWith(Id, p: String) =>
        cmp(mx, p) >= 0 && (cmp(mn, p) <= 0 ||
          UTF8String.fromString(mn).startsWith(UTF8String.fromString(p)))
      case _ => true
    }
    case _ => true
  }

  /** File passes when every payload-column predicate can hold somewhere
    * inside the column's recorded [min, max]. Columns without recorded
    * stats — older manifests, undeclared columns, all-null files — and
    * literals whose type doesn't match the recorded domain always pass:
    * pruning is advisory, the residual filter re-evaluates post-scan. */
  def colsOk(filters: Array[Filter], colStats: Seq[GraftDocColStat]): Boolean = {
    if (colStats.isEmpty) return true
    val byCol = colStats.iterator.map(c => c.col -> c).toMap
    // value inside the recorded range? None = type mismatch → no verdict
    def inRange(st: GraftDocColStat, v: Any): Option[Boolean] = (st.t, v) match {
      case ("s", s: String) =>
        Some(cmp(s, st.min) >= 0 && cmp(s, st.max) <= 0)
      case ("l", n: Number) =>
        Some(n.longValue() >= st.min.toLong && n.longValue() <= st.max.toLong)
      case _ => None
    }
    def above(st: GraftDocColStat, v: Any, strict: Boolean): Option[Boolean] =
      (st.t, v) match { // can some value in the file sit above v?
        case ("s", s: String) =>
          Some(if (strict) cmp(st.max, s) > 0 else cmp(st.max, s) >= 0)
        case ("l", n: Number) =>
          Some(if (strict) st.max.toLong > n.longValue()
          else st.max.toLong >= n.longValue())
        case _ => None
      }
    def below(st: GraftDocColStat, v: Any, strict: Boolean): Option[Boolean] =
      (st.t, v) match { // can some value in the file sit below v?
        case ("s", s: String) =>
          Some(if (strict) cmp(st.min, s) < 0 else cmp(st.min, s) <= 0)
        case ("l", n: Number) =>
          Some(if (strict) st.min.toLong < n.longValue()
          else st.min.toLong <= n.longValue())
        case _ => None
      }
    filters.forall {
      case EqualTo(c, v) if c != Id && c != GraftDocLog.CommitCol =>
        byCol.get(c).flatMap(inRange(_, v)).getOrElse(true)
      case In(c, vs) if c != Id && c != GraftDocLog.CommitCol =>
        byCol.get(c).map(st =>
          vs.exists(v => inRange(st, v).getOrElse(true))).getOrElse(true)
      case GreaterThan(c, v) if c != Id && c != GraftDocLog.CommitCol =>
        byCol.get(c).flatMap(above(_, v, strict = true)).getOrElse(true)
      case GreaterThanOrEqual(c, v) if c != Id && c != GraftDocLog.CommitCol =>
        byCol.get(c).flatMap(above(_, v, strict = false)).getOrElse(true)
      case LessThan(c, v) if c != Id && c != GraftDocLog.CommitCol =>
        byCol.get(c).flatMap(below(_, v, strict = true)).getOrElse(true)
      case LessThanOrEqual(c, v) if c != Id && c != GraftDocLog.CommitCol =>
        byCol.get(c).flatMap(below(_, v, strict = false)).getOrElse(true)
      case _ => true
    }
  }
}

class GraftDocScan(required: StructType, path: String, pushed: Array[Filter],
    conf: SerializableHadoopConf,
    readConf: GraftDocReadConf = GraftDocReadConf.default) extends Scan with Batch {
  private val splitBytes = readConf.splitBytes
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-doc $path, PushedFilters: [${pushed.mkString(", ")}]"

  private def partitionsFor(fis: Seq[GraftDocLog.CommitFileInfo]): Array[InputPartition] =
    fis
      .filter(fi => GraftDocFilters.commitOk(pushed, fi.seq) &&
        GraftDocFilters.idOk(pushed, fi.minId, fi.maxId) &&
        GraftDocFilters.colsOk(pushed, fi.colStats))
      .flatMap { fi =>
        val n = math.max(1L, (fi.bytes + splitBytes - 1) / splitBytes)
        (0L until n).map { i =>
          GraftDocInputPartition(fi.path, fi.seq, i * splitBytes,
            math.min(splitBytes, fi.bytes - i * splitBytes),
            fi.tombstone): InputPartition
        }
      }.toArray

  // `_id` and payload-column min/max stats live in commit manifests;
  // reading them is only worth a driver FS round-trip per commit when a
  // predicate that could prune against them was actually pushed
  // (`_commit` prunes from the dir name alone). Everything else —
  // snapshot planning, CDC batches, full scans — plans from the root
  // listing alone (ZERO manifest reads).
  private val needsIdStats = pushed.exists(
    _.references.exists(_ != GraftDocLog.CommitCol))

  /** File-level skip on `_commit` (each file belongs to exactly one
    * commit, and the seq rides the dir name — pruned commits' files are
    * never even listed) and `_id` (manifest min/max, read only when an
    * `_id` predicate is pushed), then byte-range splits so a few large
    * commit files still spread across the cluster. */
  override def planInputPartitions(): Array[InputPartition] =
    partitionsFor(GraftDocLog.listCommitFileInfosInRange(path, 0L, Long.MaxValue,
      withStats = needsIdStats,
      seqOk = seq => GraftDocFilters.commitOk(pushed, seq)))

  /** Micro-batch slice: the files of commits in (start, end] — listed by
    * range, so a tailing reader's per-batch planning cost tracks the
    * slice, not the table's full history. */
  private[connector] def streamPartitions(startSeq: Long, endSeq: Long): Array[InputPartition] =
    partitionsFor(GraftDocLog.listCommitFileInfosInRange(path, startSeq, endSeq,
      withStats = needsIdStats))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocReaderFactory(required.json, conf)

  /** Streaming read of the commit log — the table's CDC feed (every
    * document version, in commit order), the source role of the
    * reference pair closed over our own sink's log. Offsets are commit
    * sequence numbers: exactly-once, replayable, totally ordered. A
    * micro-batch reads the commits in (start, end]; `maxCommitsPerTrigger`
    * caps admission per batch. Caveats of tailing a log-structured store:
    * don't `compact` or truncate a table while a reader tails it — the
    * fold lands as a regular commit (readers see absorbed versions
    * re-emitted, consistent for upsert consumers but redundant), and
    * truncation restarts the seq line a checkpointed reader has already
    * passed. Additive schema evolution UNDER a running reader is safe:
    * Structured Streaming fixes the query's schema at start (a Spark
    * architecture invariant), so the running drain keeps its old
    * projection — post-evolution documents still flow (the JSON parser
    * skips the keys the old schema lacks; nothing stalls or errors) and
    * the new column becomes visible on the next (re)start, which infers
    * the union schema from the log and reads null for pre-evolution
    * documents (spec: "CDC drain across an additive evolution"). */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftDocMicroBatchStream(this, path, readConf)
}

case class GraftDocOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

class GraftDocMicroBatchStream(scan: GraftDocScan, path: String,
    readConf: GraftDocReadConf)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadMaxFiles, ReadMaxRows}

  // AvailableNow contract: pin the target at query start so the drain
  // terminates even while writers keep committing.
  // Offsets never advance past an in-flight claim (a concurrent writer
  // whose commit rename hasn't landed yet): once a checkpoint records an
  // offset above a pending seq, that commit would be skipped forever.
  // Claims older than the grace window (`claimGraceMs` stream option,
  // default 5 min) are crashed writers — their seq can never fill (the
  // claim file blocks reuse) — and are stepped over. The window is the
  // stream's tolerance for writer stalls AND cross-machine clock skew
  // (the comparison is store mtime vs this reader's clock); writers fence
  // their own renames at half this window (`GraftDocLog.finalizeCommit`),
  // so a rename can only land on a seq readers still hold for.
  private val maxCommitsPerTrigger = readConf.maxCommitsPerTrigger
  @volatile private var availableNowTarget: Option[Long] = None
  private def latestSeq: Long = GraftDocLog.safeLatestSeq(path, readConf.claimGraceMs)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(latestSeq)

  /** Row/file budgets from the standard trigger options, expressed through
    * Spark's own ReadLimit plumbing so `latestOffset` composes with any
    * limit a trigger passes. */
  override def getDefaultReadLimit: ReadLimit = {
    val limits = Seq(
      readConf.maxRowsPerTrigger.map(n => ReadLimit.maxRows(n)),
      readConf.maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n.toInt))).flatten
    limits match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def initialOffset(): Offset = GraftDocOffset(0L)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftDocOffset].seq
    val cap = availableNowTarget.getOrElse(latestSeq)
    val optCap = maxCommitsPerTrigger.map(m => math.min(cap, s + m)).getOrElse(cap)
    GraftDocOffset(math.max(s, limitedEnd(limit, s, optCap)))
  }

  /** Resolve a ReadLimit to an end seq in (s, cap]. Row/file budgets walk
    * the slice's manifests (range-priced listing — O(slice), not O(log))
    * and always admit at least one commit so the stream can't stall.
    * ReadMinRows has no holding semantics here (a log source can't wait
    * for data that isn't committed); it reads as allAvailable. */
  private def limitedEnd(limit: ReadLimit, s: Long, cap: Long): Long = limit match {
    case c: CompositeReadLimit => c.getReadLimits.map(l => limitedEnd(l, s, cap)).min
    case r: ReadMaxRows => admit(s, cap, r.maxRows(), Long.MaxValue)
    case f: ReadMaxFiles => admit(s, cap, Long.MaxValue, f.maxFiles().toLong)
    case _: ReadAllAvailable => cap
    case _ => cap
  }

  private def admit(s: Long, cap: Long, rowBudget: Long, fileBudget: Long): Long = {
    if (cap <= s) return cap
    // lazy walk, one commit at a time: returning early stops the iterator,
    // so a reader 10k commits behind pays listing/manifest I/O only for
    // the commits it ADMITS, not the whole backlog — and a file-only
    // budget skips manifests entirely (rows price from manifests; file
    // counts price from the dir listing alone)
    val slices = GraftDocLog.commitFileSlices(path, s, cap,
      withStats = rowBudget != Long.MaxValue)
    var rows = 0L
    var files = 0L
    var end = s
    var any = false
    for ((seq, fis) <- slices) {
      any = true
      val r = rows + fis.map(_.rows).sum
      val f = files + fis.length
      if (end > s && (r > rowBudget || f > fileBudget)) return end
      rows = r; files = f; end = seq
      if (rows >= rowBudget || files >= fileBudget) return end
    }
    // an empty slice (all commits in range pruned/absent) still advances
    if (!any) cap else end
  }

  override def reportLatestOffset(): Offset = GraftDocOffset(latestSeq)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftDocOffset].seq
    val e = end.asInstanceOf[GraftDocOffset].seq
    scan.streamPartitions(s, e)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()

  override def deserializeOffset(json: String): Offset =
    GraftDocOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = () // nothing to release source-side
  override def stop(): Unit = ()
}

case class GraftDocInputPartition(file: String, commitSeq: Long,
    start: Long, length: Long, tombstone: Boolean = false) extends InputPartition

class GraftDocReaderFactory(requiredSchemaJson: String,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  private val CommitOrd = -1
  private val OpOrd = -2

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftDocInputPartition]
    val required = GraftDocLog.schemaFromJson(requiredSchemaJson)
    // parse only the document fields Spark asked for (JSON column pruning:
    // the parser skips every other key), then place them — plus the
    // metadata columns _commit / _op — in Spark's required order.
    val docPart = StructType(required.filter(f =>
      f.name != GraftDocLog.CommitCol && f.name != GraftDocLog.OpCol))
    val docIndex = docPart.fieldNames.zipWithIndex.toMap
    val outPlan: Array[Int] = // >=0: doc field index; <0: metadata column
      required.fields.map(f =>
        if (f.name == GraftDocLog.CommitCol) CommitOrd
        else if (f.name == GraftDocLog.OpCol) OpOrd
        else docIndex(f.name))
    // the change type is a per-PARTITION constant (the tombstone flag is
    // encoded in the commit dir name) — zero per-row cost
    val opVal = UTF8String.fromString(if (p.tombstone) "delete" else "insert")

    new PartitionReader[InternalRow] {
      private val fs = new Path(p.file).getFileSystem(conf.value)
      private val lines = new RangeLineReader(
        fs.open(new Path(p.file)), p.start, p.length)
      private val parser = new docjson.RowJsonReader(docPart)
      private var pending: Iterator[InternalRow] = Iterator.empty
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (!pending.hasNext) {
          val line = lines.readLine()
          if (line == null) return false
          if (line.nonEmpty) pending = parser.fromJson(line)
        }
        val doc = pending.next()
        val out = new GenericInternalRow(outPlan.length)
        var i = 0
        while (i < outPlan.length) {
          out.update(i,
            if (outPlan(i) == CommitOrd) p.commitSeq
            else if (outPlan(i) == OpOrd) opVal
            else if (doc.isNullAt(outPlan(i))) null
            else doc.get(outPlan(i), docPart.fields(outPlan(i)).dataType))
          i += 1
        }
        current = out
        true
      }

      override def get(): InternalRow = current
      override def close(): Unit = lines.close()
    }
  }
}

/** Newline-aligned byte-range reader (the classic text-split protocol): a
  * split owns every line whose first byte lies in [start, start+length);
  * it reads past its end to finish the final straddling line, and a
  * non-leading split seeks to start−1 and discards through the first
  * newline — together the two rules parse every line exactly once across
  * splits. Scans a 64 KiB buffer for newlines directly (no per-byte
  * stream calls — this sits on the q77/q87 hot read path). */
private[graft] final class RangeLineReader(
    in: org.apache.hadoop.fs.FSDataInputStream, start: Long, length: Long) {
  private val end = start + length
  private var pos = if (start == 0) 0L else start - 1
  in.seek(pos)
  private val buf = new Array[Byte](64 * 1024)
  private var bufLen = 0
  private var bufPos = 0
  private var line = new Array[Byte](256)
  if (start > 0) consumeLine() // remainder of the previous split's line

  private def fill(): Boolean = {
    bufLen = in.read(buf)
    bufPos = 0
    bufLen > 0
  }

  /** Consume one line through its newline; returns the line's byte
    * length, or -1 at EOF with no bytes. */
  private def consumeLine(): Int = {
    var n = 0
    var done = false
    var sawAny = false
    while (!done) {
      if (bufPos >= bufLen && !fill()) {
        if (!sawAny) return -1
        done = true
      } else {
        sawAny = true
        var i = bufPos
        while (i < bufLen && buf(i) != '\n') i += 1
        val chunk = i - bufPos
        if (n + chunk > line.length) {
          val grown = new Array[Byte](math.max(line.length * 2, n + chunk))
          System.arraycopy(line, 0, grown, 0, n)
          line = grown
        }
        System.arraycopy(buf, bufPos, line, n, chunk)
        n += chunk
        pos += chunk
        bufPos = i
        if (i < bufLen) { // hit the newline
          bufPos += 1
          pos += 1
          done = true
        }
      }
    }
    n
  }

  /** Next owned line, or null when the split is exhausted. */
  def readLine(): String = {
    if (pos >= end) return null // next line would start past our range
    val n = consumeLine()
    if (n < 0) return null
    new String(line, 0, n, java.nio.charset.StandardCharsets.UTF_8)
  }

  def close(): Unit = in.close()
}

// --------------------------------------------------------------- write side

class GraftDocWriteBuilder(info: LogicalWriteInfo, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new Write {
    private val targetFileRows =
      Option(info.options.get(GraftDocLog.TargetFileRowsOpt)).map(_.toLong)
    private val commitTag = Option(info.options.get(GraftDocLog.CommitTagOpt))
    private val tombstone =
      Option(info.options.get(GraftDocLog.TombstoneOpt)).exists(_.toBoolean)
    private val statsColumns =
      Option(info.options.get(GraftDocLog.StatsColumnsOpt))
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Nil)

    override def toBatch: BatchWrite = new BatchWrite {
      private val writeId = UUID.randomUUID().toString

      override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DataWriterFactory =
        new GraftDocWriterFactory(
          GraftDocLog.stagingDir(path, writeId), info.schema().json, targetFileRows,
          new SerializableHadoopConf(GraftDocLog.hadoopConf()), statsColumns)

      override def commit(messages: Array[WriterCommitMessage]): Unit =
        GraftDocLog.finalizeCommit(path, GraftDocLog.stagingDir(path, writeId),
          info.schema(), info.queryId(), epochId = -1L, truncateFirst,
          GraftDocLog.statsOf(messages), commitTag, tombstone)

      override def abort(messages: Array[WriterCommitMessage]): Unit =
        GraftDocLog.deleteDir(GraftDocLog.stagingDir(path, writeId))
    }

    override def toStreaming: StreamingWrite = new StreamingWrite {
      private val writeId = UUID.randomUUID().toString
      private def epochDir(epochId: Long) =
        s"${GraftDocLog.stagingDir(path, writeId)}/epoch_$epochId"

      override def createStreamingWriterFactory(pInfo: PhysicalWriteInfo): StreamingDataWriterFactory =
        new GraftDocStreamingWriterFactory(
          GraftDocLog.stagingDir(path, writeId), info.schema().json, targetFileRows,
          new SerializableHadoopConf(GraftDocLog.hadoopConf()), statsColumns)

      private val autoCompactCommits =
        Option(info.options.get(GraftDocLog.AutoCompactCommitsOpt)).map(_.toInt)

      // Idempotent per (queryId, epochId): a replayed micro-batch is
      // detected against the query's epoch high-watermark (O(1) read) and
      // dropped — exactly-once contents over an at-least-once source.
      override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
        GraftDocLog.finalizeCommit(path, epochDir(epochId), info.schema(),
          info.queryId(), epochId, truncateFirst = false,
          GraftDocLog.statsOf(messages), commitTag, tombstone)
        // inline maintenance: a long-running one-commit-per-epoch stream
        // is exactly the writer that otherwise grows the log without
        // bound (round-3 verdict). Compacting from the stream's own
        // commit thread IS the "single writer runs the compactor"
        // operating model; GraftDoc.maintain is the single place the
        // threshold policy lives (one root listStatus, then compact).
        autoCompactCommits.foreach { n =>
          org.apache.spark.sql.SparkSession.getActiveSession
            .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
            .foreach(s => GraftDoc.maintain(s, path, n))
        }
      }

      override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        GraftDocLog.deleteDir(epochDir(epochId))
    }
  }
}

class GraftDocWriterFactory(stagingDir: String, schemaJson: String,
    targetFileRows: Option[Long], conf: SerializableHadoopConf,
    statsColumns: Seq[String] = Nil)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDocDataWriter(stagingDir, partitionId, taskId, schemaJson,
      targetFileRows, conf, statsColumns)
}

class GraftDocStreamingWriterFactory(stagingDir: String, schemaJson: String,
    targetFileRows: Option[Long], conf: SerializableHadoopConf,
    statsColumns: Seq[String] = Nil)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftDocDataWriter(s"$stagingDir/epoch_$epochId", partitionId, taskId,
      schemaJson, targetFileRows, conf, statsColumns)
}

/** Per-column min/max recorded in the commit manifest for a DECLARED
  * payload column (`statsColumns` write option) — the Delta/Iceberg-class
  * file-skip index for predicates on payload columns, not just `_id`.
  * `t` is the comparison domain: "s" = UTF-8 binary string order (the
  * order Spark's own string comparisons use), "l" = signed long. Values
  * are serialized as strings either way (one manifest grammar). */
case class GraftDocColStat(col: String, t: String, min: String, max: String)

/** Per-part-file stats recorded in the commit manifest; the scan's
  * file-skip index for `_id` point reads and range scans (and, when the
  * writer declared `statsColumns`, payload-column predicates). */
case class GraftDocFileStat(name: String, rows: Long,
    minId: Option[String], maxId: Option[String],
    cols: Seq[GraftDocColStat] = Nil)

/** Task-side writer: serializes rows to JSON lines, rolling to a new part
  * file every `targetFileRows` rows (small-files/large-files control with
  * zero shuffle — the file boundary is task-local), and tracking each
  * file's row count and `_id` min/max for the manifest. */
class GraftDocDataWriter(stagingDir: String, partitionId: Int, taskId: Long,
    schemaJson: String, targetFileRows: Option[Long],
    conf: SerializableHadoopConf,
    statsColumns: Seq[String] = Nil) extends DataWriter[InternalRow] {

  private val schema = GraftDocLog.schemaFromJson(schemaJson)
  private val json = new docjson.RowJsonWriter(schema)
  private val fs = new Path(stagingDir).getFileSystem(conf.value)
  // _id is the leading string column for document writes (W3 validation);
  // tolerate arbitrary schemas (no stats) so the writer stays general
  private val idOrdinal =
    if (schema.fields.headOption.exists(f =>
      f.name == "_id" && f.dataType == StringType)) 0 else -1
  // declared payload stats columns resolved to (name, ordinal, domain):
  // strings track in UTF-8 binary order, int/long in signed-long order;
  // other types (and names absent from the schema) are silently skipped
  // — stats are a pure pruning aid, never a correctness surface
  private val statCols: Array[(String, Int, Boolean)] =
    statsColumns.flatMap { name =>
      val i = schema.fieldNames.indexOf(name)
      if (i < 0) None
      else schema.fields(i).dataType match {
        case StringType => Some((name, i, true))
        case LongType | org.apache.spark.sql.types.IntegerType =>
          Some((name, i, false))
        case _ => None
      }
    }.toArray
  private var out: java.io.BufferedWriter = _
  private var curFile: Path = _
  private var fileIdx = 0
  private var rowsInFile = 0L
  private var minId: UTF8String = _
  private var maxId: UTF8String = _
  private val colMinS = new Array[UTF8String](statCols.length)
  private val colMaxS = new Array[UTF8String](statCols.length)
  private val colMinL = new Array[Long](statCols.length)
  private val colMaxL = new Array[Long](statCols.length)
  private val colSeen = new Array[Boolean](statCols.length)
  private val stats = ArrayBuffer.empty[GraftDocFileStat]
  private val written = ArrayBuffer.empty[Path]

  private def sealFile(): Unit = {
    if (out != null) {
      out.close()
      val cols = statCols.indices.collect {
        case k if colSeen(k) =>
          val (name, _, isStr) = statCols(k)
          if (isStr)
            GraftDocColStat(name, "s", colMinS(k).toString, colMaxS(k).toString)
          else
            GraftDocColStat(name, "l", colMinL(k).toString, colMaxL(k).toString)
      }.toSeq
      stats += GraftDocFileStat(curFile.getName, rowsInFile,
        Option(minId).map(_.toString), Option(maxId).map(_.toString), cols)
    }
    out = null
    rowsInFile = 0L
    minId = null
    maxId = null
    java.util.Arrays.fill(colSeen, false)
    java.util.Arrays.fill(colMinS.asInstanceOf[Array[AnyRef]], null)
    java.util.Arrays.fill(colMaxS.asInstanceOf[Array[AnyRef]], null)
  }

  private def roll(): Unit = {
    sealFile()
    curFile = new Path(stagingDir,
      f"part-$partitionId%05d-$taskId-$fileIdx%04d.jsonl")
    written += curFile
    out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(fs.create(curFile, true), "UTF-8"))
    fileIdx += 1
  }

  override def write(row: InternalRow): Unit = {
    if (out == null || targetFileRows.exists(rowsInFile >= _)) roll()
    if (idOrdinal >= 0 && !row.isNullAt(idOrdinal)) {
      // clone: the UTF8String points into a buffer the row reuses
      val id = row.getUTF8String(idOrdinal).clone()
      if (minId == null || id.compareTo(minId) < 0) minId = id
      if (maxId == null || id.compareTo(maxId) > 0) maxId = id
    }
    var k = 0
    while (k < statCols.length) {
      val (_, ord, isStr) = statCols(k)
      if (!row.isNullAt(ord)) {
        if (isStr) {
          val v = row.getUTF8String(ord).clone()
          if (!colSeen(k) || v.compareTo(colMinS(k)) < 0) colMinS(k) = v
          if (!colSeen(k) || v.compareTo(colMaxS(k)) > 0) colMaxS(k) = v
        } else {
          val v = schema.fields(ord).dataType match {
            case LongType => row.getLong(ord)
            case _ => row.getInt(ord).toLong
          }
          if (!colSeen(k) || v < colMinL(k)) colMinL(k) = v
          if (!colSeen(k) || v > colMaxL(k)) colMaxL(k) = v
        }
        colSeen(k) = true
      }
      k += 1
    }
    out.write(json.toJson(row))
    out.write('\n')
    rowsInFile += 1
  }

  override def commit(): WriterCommitMessage = {
    sealFile()
    json.close()
    GraftDocCommitMessage(stats.toSeq)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    written.foreach(fs.delete(_, false))
  }

  override def close(): Unit = ()
}

case class GraftDocCommitMessage(files: Seq[GraftDocFileStat])
    extends WriterCommitMessage

// ------------------------------------------------------------- log protocol

/** Driver-side commit-log operations for graft-doc tables. */
object GraftDocLog {
  /** Public-API replacement for the `private[sql]` `StructType.fromString`. */
  def schemaFromJson(json: String): StructType =
    org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType]

  val CommitCol = "_commit"
  val OpCol = "_op"
  val SchemaFile = "_schema.json"
  /** Additive schema evolution is APPEND-ONLY: each evolving writer
    * publishes its new columns as a numbered delta file
    * (`_schema_d<n>.json`, create-exclusive — the same primitive the
    * commit claim CAS uses), and the recorded schema is the FOLD of the
    * base [[SchemaFile]] plus every parseable delta in filename order
    * (first occurrence of a name wins). Two concurrent evolving writers
    * therefore CANNOT lose each other's columns — there is no
    * read-modify-write of shared state to race on, each writer only ever
    * creates its own file (closes the round-4 two-winner window that the
    * old single-file union rewrite left open). A torn/in-flight delta is
    * skipped by readers until its writer finishes; the writer loops until
    * the fold visibly contains its fields before its data commit renames,
    * so no committed document ever carries a column the fold lacks. */
  val SchemaDeltaPrefix = "_schema_d"
  val ManifestFile = "_manifest.json"
  /** Log-format version marker, written once when a table is CREATED.
    * Version 2 = the tombstone flag rides the commit dir name
    * (`commit_<seq>t_<uuid>`), so delete discovery needs no manifest
    * reads. Tables WITHOUT the marker predate the flag (their tombstone
    * commits are flagged only inside the manifest), so [[tableState]]
    * falls back to the legacy manifest scan for them — deleted documents
    * must never resurface just because the discovery fast-path got
    * faster. A legacy table keeps its legacy planning cost until
    * truncated (truncate empties the log and stamps the marker). */
  val FormatFile = "_format"
  val FormatVersion = "2"
  val TargetFileRowsOpt = "targetFileRows"
  /** Comma-separated payload columns whose per-file min/max land in the
    * commit manifest (string/int/long only; others silently skipped) —
    * the Delta/Iceberg-class file-skip extension beyond `_id`. */
  val StatsColumnsOpt = "statsColumns"
  val CommitTagOpt = "commitTag"
  val MaxSplitBytesOpt = "maxSplitBytes"
  val MaxCommitsPerTriggerOpt = "maxCommitsPerTrigger"
  val MaxRowsPerTriggerOpt = "maxRowsPerTrigger"
  val MaxFilesPerTriggerOpt = "maxFilesPerTrigger"
  val ClaimGraceMsOpt = "claimGraceMs"
  val WithOpOpt = "withOp"
  val AutoCompactCommitsOpt = "autoCompactCommits"
  val TombstoneOpt = "tombstone"
  val DefaultSplitBytes: Long = 128L * 1024 * 1024
  /** Reader tolerance for an in-flight writer (claim created, commit
    * rename not yet landed) before the claim is judged crashed and
    * stepped over. The comparison is store mtime vs the READER's clock,
    * so the window must absorb cross-machine clock skew on top of writer
    * stalls; writers fence their own renames at half this window
    * ([[finalizeCommit]]), leaving the other half as the skew + rename
    * budget. Override per stream with the `claimGraceMs` option. */
  val DefaultClaimGraceMs: Long = 5 * 60 * 1000L
  /** Writer-side rename fence: half the reader grace window. Readers may
    * RAISE `claimGraceMs` freely; configuring it BELOW the default breaks
    * the fence invariant (a fenced writer could still land a rename after
    * an impatient reader stepped over it). Test-overridable. */
  @volatile private[graft] var writerFenceMs: Long = DefaultClaimGraceMs / 2
  /** Test hook: one-shot stall injected between winning a claim and the
    * writer-fence check — simulates a GC pause / slow object store on the
    * claim-to-rename path. */
  private[graft] val postClaimStallMsForTest = new AtomicLong(0L)
  private val EpochsDir = "_epochs"
  // widths beyond 9 digits still parse (zero-padding only keeps the
  // common range lexicographically ordered); the optional `t` marks a
  // TOMBSTONE commit — riding the dir name means delete discovery costs
  // snapshot planning zero manifest reads (same O(1) treatment the epoch
  // watermark gives replay checks)
  private val CommitRe = "commit_([0-9]+)(t?)_.*".r

  /** Fallback-path instrumentation: manifests read on the epoch-replay
    * check. Stays at zero while the high-watermark file is present and
    * current — the O(1) contract `GraftDocConnectorSpec` asserts. */
  private[graft] val fallbackManifestReads = new AtomicLong(0L)

  /** Every manifest read anywhere in the log protocol (planning,
    * admission, replay fallback) — the counting-FS instrument behind the
    * O(1)-manifest-reads specs for snapshot planning. */
  private[graft] val manifestReads = new AtomicLong(0L)

  /** The active session's Hadoop configuration (carries `spark.hadoop.*`
    * overrides — object-store credentials, custom FS impls); plain
    * classpath configuration only when no session exists (tests,
    * tooling). */
  def hadoopConf(): Configuration =
    SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

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
    (hp.getFileSystem(hadoopConf()), hp)
  }

  def stagingDir(tablePath: String, writeId: String): String =
    s"$tablePath/_staging/$writeId"

  def deleteDir(dir: String): Unit = {
    val (fs, p) = fsFor(dir)
    fs.delete(p, true)
  }

  def readSchema(tablePath: String): Option[StructType] = {
    val (fs, root) = fsFor(tablePath)
    foldedSchema(fs, root)
  }

  private val SchemaDeltaRe = (SchemaDeltaPrefix + "([0-9]{9})\\.json").r

  /** All schema-delta files under the table root, sorted by version —
    * including torn/unparseable ones (callers picking the next free slot
    * must never reuse a crashed writer's number). */
  private def schemaDeltaFiles(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    fs.listStatus(root).toSeq.collect {
      case s if s.isFile =>
        s.getPath.getName match {
          case SchemaDeltaRe(v) => Some(v.toLong -> s.getPath)
          case _ => None
        }
    }.flatten.sortBy(_._1)

  /** The recorded table schema: base [[SchemaFile]] folded with every
    * PARSEABLE delta in version order, first occurrence of a field name
    * winning among same-type duplicates. Unparseable deltas are in-flight
    * or crashed writers — their fields become visible when (iff) the file
    * completes; their writers do not rename a data commit until then (see
    * [[publishSchemaDelta]]), so skipping them here can never hide a
    * committed document's column.
    *
    * TYPE conflicts are checked HERE, not only at publish time: a torn
    * delta that completes late — after a racing writer's publish-time
    * check could no longer see it — may carry the same column name with a
    * different type. Publish-time checks only see parseable deltas, so
    * fold time is the one place every completed delta is finally visible;
    * silently letting slot order win would retroactively retype a later
    * writer's already-committed column. Readers fail crisply instead. */
  def foldedSchema(fs: FileSystem, root: Path): Option[StructType] = {
    val basePath = new Path(root, SchemaFile)
    if (!fs.exists(basePath)) None
    else {
      var fields = schemaFromJson(readFile(fs, basePath)).fields.toSeq
      schemaDeltaFiles(fs, root).foreach { case (v, p) =>
        (try Some(schemaFromJson(readFile(fs, p)))
        catch { case scala.util.control.NonFatal(_) => None }).foreach { d =>
          val byName = fields.map(f => f.name -> f.dataType).toMap
          d.fields.foreach { f =>
            byName.get(f.name).foreach { t =>
              if (t != f.dataType) throw new IllegalStateException(
                s"graft-doc: schema delta $v under $root retypes column " +
                  s"'${f.name}' (${t.simpleString} -> ${f.dataType.simpleString})" +
                  " — two evolving writers committed conflicting types " +
                  "(one delta likely completed after the other's conflict " +
                  "check ran); resolve by removing the conflicting delta file")
            }
          }
          fields = fields ++ d.fields.filterNot(f => byName.contains(f.name))
        }
      }
      Some(StructType(fields))
    }
  }

  /** Test/tooling entry: evolve a table's recorded schema without a data
    * commit (also what a metadata-only ALTER would call). */
  private[graft] def publishSchemaDelta(tablePath: String,
      newFields: Seq[StructField]): Unit = {
    val (fs, root) = fsFor(tablePath)
    publishSchemaDelta(fs, root, newFields)
  }

  /** Publish `newFields` as a schema delta and loop until the fold
    * visibly contains them. Create-exclusive on a numbered slot is the
    * only write — no shared file is ever rewritten, so two concurrent
    * evolving writers both land (the loser of a slot just takes the next
    * one). A racer publishing the SAME column name with a DIFFERENT type
    * is a genuine user conflict and fails crisply here, before this
    * writer's data commit; same-name-same-type racers dedup in the fold. */
  private def publishSchemaDelta(fs: FileSystem, root: Path,
      newFields: Seq[StructField]): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      val folded = foldedSchema(fs, root).getOrElse(throw new IllegalStateException(
        s"graft-doc: schema base vanished under $root during evolution"))
      val byName = folded.fields.map(f => f.name -> f.dataType).toMap
      newFields.foreach { f =>
        byName.get(f.name).foreach { t =>
          if (t != f.dataType) throw new IllegalArgumentException(
            s"graft-doc: concurrent schema evolution conflict on column " +
              s"'${f.name}' — a racing writer recorded type ${t.simpleString}, " +
              s"this writer carries ${f.dataType.simpleString}")
        }
      }
      val missing = newFields.filterNot(f => byName.contains(f.name))
      if (missing.isEmpty) done = true
      else {
        val next = schemaDeltaFiles(fs, root).lastOption.map(_._1).getOrElse(0L) + 1
        val p = new Path(root, f"$SchemaDeltaPrefix$next%09d.json")
        try writeFile(fs, p, StructType(missing).json, overwrite = false)
        catch { case _: java.io.IOException => () } // slot taken — re-fold, retry
        attempts += 1
        if (attempts > 4096) throw new java.io.IOException(
          s"graft-doc: could not publish schema delta under $root after $attempts attempts")
      }
    }
  }

  def statsOf(messages: Array[WriterCommitMessage]): Seq[GraftDocFileStat] =
    messages.toSeq.collect { case m: GraftDocCommitMessage => m.files }.flatten

  // ----------------------------------------------------------- tiny JSON
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def junstr(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => b += '"'; i += 2
          case '\\' => b += '\\'; i += 2
          case 'n' => b += '\n'; i += 2
          case 'r' => b += '\r'; i += 2
          case 't' => b += '\t'; i += 2
          case 'u' => b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case o => b += o; i += 2
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }

  private val QStr = "(?:[^\"\\\\]|\\\\.)*"
  private val QueryIdRe = ("\"queryId\":\"(" + QStr + ")\"").r
  private val EpochIdRe = "\"epochId\":(-?[0-9]+)".r
  private val TagRe = ("\"tag\":\"(" + QStr + ")\"").r
  // one payload-column stat entry inside a file entry's "cols" array
  private val ColEntryPat =
    "\\{\"c\":\"" + QStr + "\",\"t\":\"[sl]\",\"min\":\"" + QStr +
      "\",\"max\":\"" + QStr + "\"\\}"
  private val ColEntryCapRe =
    ("\\{\"c\":\"(" + QStr + ")\",\"t\":\"([sl])\",\"min\":\"(" + QStr +
      ")\",\"max\":\"(" + QStr + ")\"\\}").r
  private val FileEntryRe =
    ("\\{\"name\":\"(" + QStr + ")\",\"rows\":([0-9]+)" +
      "(?:,\"minId\":\"(" + QStr + ")\",\"maxId\":\"(" + QStr + ")\")?" +
      "(?:,\"cols\":\\[(" + ColEntryPat + "(?:," + ColEntryPat + ")*)\\])?\\}").r

  private[connector] def parseColStats(blob: String): Seq[GraftDocColStat] =
    ColEntryCapRe.findAllMatchIn(blob).map { m =>
      GraftDocColStat(junstr(m.group(1)), m.group(2),
        junstr(m.group(3)), junstr(m.group(4)))
    }.toSeq

  private def manifestJson(queryId: String, epochId: Long, tag: Option[String],
      stats: Seq[GraftDocFileStat], tombstone: Boolean): String = {
    val files = stats.map { f =>
      val ids = (f.minId, f.maxId) match {
        case (Some(lo), Some(hi)) => s""","minId":${jstr(lo)},"maxId":${jstr(hi)}"""
        case _ => ""
      }
      val cols =
        if (f.cols.isEmpty) ""
        else f.cols.map(c =>
          s"""{"c":${jstr(c.col)},"t":${jstr(c.t)},""" +
            s""""min":${jstr(c.min)},"max":${jstr(c.max)}}""")
          .mkString(""","cols":[""", ",", "]")
      s"""{"name":${jstr(f.name)},"rows":${f.rows}$ids$cols}"""
    }.mkString("[", ",", "]")
    val tagPart = tag.map(t => s""","tag":${jstr(t)}""").getOrElse("")
    val tombPart = if (tombstone) ""","tombstone":true""" else ""
    s"""{"queryId":${jstr(queryId)},"epochId":$epochId$tagPart$tombPart,"files":$files}"""
  }

  // ---------------------------------------------------------------- listing

  /** (commitSeq, file) for every part file in the log, commit order. */
  def listCommitFiles(tablePath: String): Seq[(Long, String)] =
    listCommitFileInfos(tablePath).map(fi => fi.seq -> fi.path)

  case class CommitFileInfo(seq: Long, path: String, bytes: Long, rows: Long,
      minId: Option[String], maxId: Option[String], tombstone: Boolean,
      colStats: Seq[GraftDocColStat] = Nil)

  /** Every part file with its commit seq, byte length, and (when the
    * manifest recorded them) row count and `_id` min/max — the scan's
    * planning input. */
  def listCommitFileInfos(tablePath: String): Seq[CommitFileInfo] =
    listCommitFileInfosInRange(tablePath, 0L, Long.MaxValue)

  /** Range-sliced listing: manifests and part files are read only for
    * commits with fromExcl < seq ≤ toIncl AND `seqOk(seq)` (the seq is in
    * the dir name, so pruned commits cost nothing beyond the root
    * listStatus) — a tailing CDC reader plans each micro-batch in
    * O(slice), not O(log), and a `_commit`-bounded batch scan never even
    * lists pruned commits' files. `withStats = false` skips the manifest
    * read entirely (rows report 0, `_id` min/max report unknown) — the
    * right mode when no pushed filter needs `_id` stats, which makes
    * snapshot planning O(0) manifest reads. */
  def listCommitFileInfosInRange(tablePath: String, fromExcl: Long,
      toIncl: Long, withStats: Boolean = true,
      seqOk: Long => Boolean = _ => true): Seq[CommitFileInfo] =
    commitFileSlices(tablePath, fromExcl, toIncl, withStats, seqOk)
      .flatMap(_._2).toSeq

  /** Lazy per-commit view of [[listCommitFileInfosInRange]]: ONE root
    * listing up front, then file listings (and manifests, only when
    * `withStats`) read commit by commit as the iterator is consumed —
    * so a consumer that stops early (streaming admission against a
    * row/file budget) pays for the commits it admits, not the whole
    * backlog behind the checkpoint. */
  def commitFileSlices(tablePath: String, fromExcl: Long,
      toIncl: Long, withStats: Boolean = true,
      seqOk: Long => Boolean = _ => true): Iterator[(Long, Seq[CommitFileInfo])] = {
    val (fs, root) = fsFor(tablePath)
    if (!fs.exists(root)) return Iterator.empty
    commitDirsFlagged(fs, root).iterator
      .filter { case (seq, _, _) => seq > fromExcl && seq <= toIncl && seqOk(seq) }
      .map { case (seq, tomb, dir) =>
        val m = new Path(dir, ManifestFile)
        val stat: Map[String, (Long, Option[String], Option[String], Seq[GraftDocColStat])] =
          if (!withStats || !fs.exists(m)) Map.empty
          else FileEntryRe.findAllMatchIn(readFile(fs, m)).map { mm =>
            junstr(mm.group(1)) -> ((mm.group(2).toLong,
              Option(mm.group(3)).map(junstr), Option(mm.group(4)).map(junstr),
              Option(mm.group(5)).map(parseColStats).getOrElse(Nil)))
          }.toMap
        seq -> fs.listStatus(dir).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".jsonl"))
          .map { s =>
            val (rows, lo, hi, cs) = stat.getOrElse(s.getPath.getName,
              (0L, None, None, Nil))
            CommitFileInfo(seq, s.getPath.toString, s.getLen, rows, lo, hi,
              tomb, cs)
          }
      }
  }

  /** Highest commit seq a READER may safely advance to: the youngest
    * claim without its commit dir marks an in-flight commit whose rename
    * hasn't landed — advancing past it would permanently skip that seq
    * once a checkpoint records the offset. Claims older than `graceMs`
    * with no dir are crashed writers (their seq will never fill; the
    * claim file blocks reuse) and are skipped so a dead claim cannot
    * stall the stream forever. */
  def safeLatestSeq(tablePath: String, graceMs: Long): Long = {
    val (fs, root) = fsFor(tablePath)
    if (!fs.exists(root)) return 0L
    val statuses = fs.listStatus(root).toSeq
    val dirSeqs = statuses.collect {
      case s if s.isDirectory => s.getPath.getName match {
        case CommitRe(q, _) => Some(q.toLong)
        case _ => None
      }
    }.flatten.toSet
    val latest = if (dirSeqs.isEmpty) 0L else dirSeqs.max
    val now = System.currentTimeMillis()
    val inFlight = statuses.collect {
      case s if s.isFile && s.getPath.getName.startsWith("_claim_") &&
          now - s.getModificationTime < graceMs =>
        s.getPath.getName.stripPrefix("_claim_").toLong
    }.filterNot(dirSeqs.contains)
    inFlight.filter(_ <= latest).minOption.map(_ - 1).getOrElse(latest)
  }

  /** Stamp the `_format` version marker unconditionally — called by
    * compaction, the point at which a legacy table's pre-flag commits
    * have provably been folded away (see [[GraftDoc.compact]]). */
  def stampFormatMarker(tablePath: String): Unit = {
    val (fs, root) = fsFor(tablePath)
    if (fs.exists(root))
      writeFile(fs, new Path(root, FormatFile), FormatVersion, overwrite = true)
  }

  /** One-pass consistent view for snapshot construction: (latest commit
    * seq, tombstone commit seqs). Reading both in a single listing and
    * pinning the scan to `_commit <= latestSeq` makes `snapshot` a
    * point-in-time read — a delete or write landing between plan
    * construction and execution is invisible instead of half-visible
    * (the tombstone set and the file list can never disagree). Cost is
    * ONE root listing and ZERO manifest reads: the tombstone flag rides
    * the commit dir name (`commit_<seq>t_<uuid>`), so delete discovery
    * on a long-unmaintained table (thousands of CDC epochs, no
    * compaction) stays flat instead of paying O(#commits) driver FS
    * round-trips — `GraftDocConnectorSpec` pins this with a
    * manifest-read counter over 50 epochs. */
  def tableState(tablePath: String): (Long, Set[Long]) = {
    val (fs, root) = fsFor(tablePath)
    if (!fs.exists(root)) return (0L, Set.empty)
    val dirs = commitDirsFlagged(fs, root)
    val latest = dirs.lastOption.map(_._1).getOrElse(0L)
    val flagged = dirs.collect { case (seq, true, _) => seq }.toSet
    if (dirs.isEmpty || fs.exists(new Path(root, FormatFile)))
      (latest, flagged)
    else {
      // legacy (pre-marker) table: tombstone commits carry the flag only
      // in their manifest — scan the unflagged ones so old deletes never
      // resurface (O(#commits), the cost this table format always paid).
      // A missing or unreadable manifest fails LOUDLY: degrading to
      // "not a tombstone" on a transient I/O error would silently
      // resurface deleted documents — the exact corruption this fallback
      // exists to prevent. The caller can retry; the store cannot
      // un-delete.
      val legacy = dirs.collect {
        case (seq, false, dir) =>
          val m = new Path(dir, ManifestFile)
          if (!fs.exists(m)) throw new java.io.IOException(
            s"graft-doc: legacy commit $dir has no $ManifestFile; cannot " +
              "determine its tombstone state (snapshot would be unsafe)")
          if (readFile(fs, m).contains("\"tombstone\":true")) Some(seq) else None
      }.flatten.toSet
      (latest, flagged ++ legacy)
    }
  }

  /** Live commit-dir count — one root listStatus, no file reads; the
    * auto-compaction trigger's cost model. */
  def liveCommitCount(tablePath: String): Int = {
    val (fs, root) = fsFor(tablePath)
    if (!fs.exists(root)) 0 else commitDirsFlagged(fs, root).size
  }

  /** (seq, isTombstone, dir) for every commit dir, ascending seq — both
    * flags decoded from the dir name alone (no file reads). */
  private def commitDirsFlagged(fs: FileSystem, root: Path): Seq[(Long, Boolean, Path)] =
    fs.listStatus(root).toSeq.collect {
      case s if s.isDirectory =>
        s.getPath.getName match {
          case CommitRe(seq, t) => Some((seq.toLong, t.nonEmpty, s.getPath))
          case _ => None
        }
    }.flatten.sortBy(_._1)

  private def commitDirs(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    commitDirsFlagged(fs, root).map { case (seq, _, dir) => seq -> dir }

  private def writeFile(fs: FileSystem, p: Path, content: String,
      overwrite: Boolean): Unit = {
    // Create-exclusive must be ATOMIC — every slot protocol here (delta
    // slots, claim markers) leans on it. HDFS's create(overwrite=false)
    // is atomic; object stores map to conditional PUT (see README). But
    // Hadoop's LOCAL filesystem implements it as exists-check-then-open:
    // two racers can both pass the check and the later open TRUNCATES
    // the earlier writer's bytes — the winner's content silently
    // vanishes while its publish loop believes the slot landed (observed
    // as a lost column under a 4-thread evolution stampede). For the
    // file scheme, claim the slot first with NIO createFile (POSIX
    // O_CREAT|O_EXCL, genuinely atomic), then write the content through
    // the Hadoop FS as the slot's owner; a fold that reads the claimed-
    // but-unwritten file sees a torn delta and skips it until complete,
    // which is the protocol's sanctioned in-flight state.
    if (!overwrite && fs.getScheme == "file") {
      if (!createExclusive(fs, p))
        throw new java.io.IOException(s"graft-doc: $p already exists")
    }
    val out = fs.create(p, overwrite || fs.getScheme == "file")
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Atomic create-exclusive of an empty file: true iff this caller won
    * the slot. The one primitive every slot/claim protocol reduces to
    * (README maps it to conditional PUT for object stores). */
  private def createExclusive(fs: FileSystem, p: Path): Boolean =
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.createFile(java.nio.file.Paths.get(p.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.NoSuchFileException => false // parent raced away
      }
    } else {
      try { fs.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
    }

  private def readFile(fs: FileSystem, p: Path): String = {
    if (p.getName == ManifestFile) manifestReads.incrementAndGet()
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Atomic file replacement: write a temp sibling, then a rename that
    * OVERWRITES the target in one step (`FileContext` rename semantics;
    * plain `FileSystem.create(overwrite = true)` truncates in place, so a
    * concurrent reader can observe a torn file). Both the temp write and
    * the rename go through `FileContext` — its local implementation is
    * checksum-free, so no stale `.crc` sibling survives the rename to
    * poison later checksummed reads. */
  private def writeFileAtomic(fs: FileSystem, p: Path, content: String): Unit = {
    val qp = fs.makeQualified(p)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(qp.toUri, hadoopConf())
    val tmp = new Path(qp.getParent, s".${qp.getName}.tmp-${UUID.randomUUID().toString}")
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fc.rename(tmp, qp, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  // -------------------------------------------------- epoch high-watermark

  private def epochHwPath(root: Path, queryId: String): Path =
    new Path(new Path(root, EpochsDir),
      queryId.replaceAll("[^A-Za-z0-9._-]", "_"))

  /** (highest committed epochId, the commit seq it landed at). */
  private def readEpochHw(fs: FileSystem, root: Path,
      queryId: String): Option[(Long, Long)] = {
    val p = epochHwPath(root, queryId)
    try {
      if (!fs.exists(p)) None
      else {
        val txt = readFile(fs, p)
        for {
          e <- EpochIdRe.findFirstMatchIn(txt).map(_.group(1).toLong)
          s <- "\"seq\":([0-9]+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
        } yield (e, s)
      }
    } catch { case _: Exception => None } // torn write → fall back to scan
  }

  private def writeEpochHw(fs: FileSystem, root: Path, queryId: String,
      epochId: Long, seq: Long): Unit = {
    fs.mkdirs(new Path(root, EpochsDir))
    // single writer per queryId (the query's own driver); the atomic
    // temp+rename means a concurrent replay check can never observe a
    // torn file (and the manifest fallback still covers a crash between
    // commit rename and this update)
    writeFileAtomic(fs, epochHwPath(root, queryId),
      s"""{"epochId":$epochId,"seq":$seq}""")
  }

  /** O(1) epoch-replay check: the high-watermark file answers most
    * replays in one read; only commits ABOVE the recorded watermark seq
    * (normally none) have their manifests scanned — covering the crash
    * window between commit rename and watermark update. */
  private def epochAlreadyCommitted(fs: FileSystem, root: Path,
      queryId: String, epochId: Long): Boolean = {
    val hw = readEpochHw(fs, root, queryId)
    if (hw.exists(epochId <= _._1)) return true
    val fromSeq = hw.map(_._2).getOrElse(0L)
    val found = commitDirs(fs, root).filter(_._1 > fromSeq).find { case (_, dir) =>
      val m = new Path(dir, ManifestFile)
      fs.exists(m) && {
        fallbackManifestReads.incrementAndGet()
        val txt = readFile(fs, m)
        QueryIdRe.findFirstMatchIn(txt).exists(mm => junstr(mm.group(1)) == queryId) &&
          EpochIdRe.findFirstMatchIn(txt).exists(_.group(1).toLong == epochId)
      }
    }
    // repair the watermark so the next replay check is O(1) again
    found.foreach { case (seq, _) => writeEpochHw(fs, root, queryId, epochId, seq) }
    found.isDefined
  }

  // -------------------------------------------------------------- commit

  /** Commit locks scoped PER TABLE PATH: two tables never serialize
    * against each other; same-table in-JVM writers still do (which keeps
    * the common single-driver case free of claim contention). */
  private val tableLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Atomically publish a staged write as the next commit.
    *
    * Concurrent writers (separate drivers on one table) are safe: the
    * sequence number is claimed by an atomic `create(overwrite=false)` of
    * a `_claim_<seq>` marker — exactly one writer wins a given seq; the
    * loser advances and retries, so both commits land with distinct seqs.
    * (On stores without atomic create-exclusive — S3 without a consistency
    * layer — pair the table with a coordinating log service, as every
    * log-structured format does.)
    *
    * Writer-side FENCE: a streaming reader steps over claims older than
    * its grace window ([[safeLatestSeq]]); if this writer stalls (GC
    * pause, slow store) long enough that its rename could land on a seq
    * readers no longer hold for — half the default window, measured on
    * the writer's own monotonic clock, so clock skew cannot widen it —
    * it abandons the claim and re-seqs, making a skipped-forever commit
    * structurally impossible rather than merely unlikely. */
  def finalizeCommit(tablePath: String, stagingDir: String, schema: StructType,
      queryId: String, epochId: Long, truncateFirst: Boolean,
      stats: Seq[GraftDocFileStat] = Nil,
      tag: Option[String] = None,
      tombstone: Boolean = false): Unit =
    tableLocks.computeIfAbsent(tablePath, _ => new Object).synchronized {
    val (fs, root) = fsFor(tablePath)
    val staging = new Path(stagingDir)
    fs.mkdirs(staging) // zero-row writes still commit (empty batch is a commit)

    if (epochId >= 0 && epochAlreadyCommitted(fs, root, queryId, epochId)) {
      fs.delete(staging, true) // replayed micro-batch: already in the log
      return
    }
    if (truncateFirst) {
      commitDirs(fs, root).foreach { case (_, d) => fs.delete(d, true) }
      claimFiles(fs, root).foreach(fs.delete(_, false))
      fs.delete(new Path(root, EpochsDir), true)
    }
    // stamp the format version on table CREATION only (no commits yet —
    // fresh table or just truncated): a legacy table must never gain the
    // marker while legacy commits remain, or their manifest-flagged
    // tombstones would go undiscovered (see [[FormatFile]])
    val formatMarker = new Path(root, FormatFile)
    if (!fs.exists(formatMarker) && commitDirs(fs, root).isEmpty)
      writeFile(fs, formatMarker, FormatVersion, overwrite = true)

    // schema stability across commits: an append whose fields conflict
    // with the table's recorded schema would silently corrupt every later
    // read (the scan parses documents with the recorded schema), so it is
    // rejected here — the write-side schema validation the reference
    // performs at configure time (W3), enforced at the log boundary.
    // ADDITIVE evolution is the one admitted change; new NULLABLE fields
    // are published as append-only delta files (see [[SchemaDeltaPrefix]])
    // and old documents read null for them (the JSON parser yields null
    // for absent keys), exactly merge-on-read evolution semantics.
    // Tombstone commits carry only `_id` and skip the check entirely.
    val schemaPathCheck = new Path(root, SchemaFile)
    if (!tombstone && !truncateFirst && fs.exists(schemaPathCheck)) {
      // Append admission, three rules (merge-on-read evolution):
      //  1. every BASE field (the table-creation schema) must be carried
      //     with its recorded type — dropping/retyping the core schema is
      //     not additive and requires overwrite;
      //  2. no carried field may RETYPE any recorded field (base or
      //     evolved) — a retype would corrupt parses of existing docs;
      //  3. evolved (delta-added) fields MAY be omitted: they are
      //     nullable by construction, and an append that omits one reads
      //     null for it — the same merge-on-read rule that lets OLD docs
      //     read null for NEW fields. This is what admits two writers
      //     racing distinct evolutions from the same base: each omits
      //     only the other's delta field, never a base field.
      val base = schemaFromJson(readFile(fs, schemaPathCheck))
      val recorded = foldedSchema(fs, root).get
      val gotByName = schema.fields.map(f => f.name -> f).toMap
      val carriesAllBase = base.fields.forall(bf =>
        gotByName.get(bf.name).exists(_.dataType == bf.dataType))
      val recByName = recorded.fields.map(f => f.name -> f.dataType).toMap
      val retypes = schema.fields.exists(f =>
        recByName.get(f.name).exists(_ != f.dataType))
      if (!carriesAllBase || retypes) {
        fs.delete(staging, true)
        throw new IllegalArgumentException(
          s"graft-doc: append schema ${schema.simpleString} does not match " +
            s"table schema ${recorded.simpleString} at $tablePath " +
            "(additive new fields evolve the schema; dropping or retyping " +
            "recorded fields requires overwrite)")
      }
      // publish any new columns NOW, before any commit lands: append-only
      // delta files make concurrent evolution lost-update-free (see
      // [[SchemaDeltaPrefix]]); if this writer subsequently fails to
      // commit, the extra column stays recorded and reads null — the
      // benign direction (pre-evolution docs read null anyway)
      val newFields = schema.fields
        .filterNot(f => recorded.fieldNames.contains(f.name))
        .map(_.copy(nullable = true)).toSeq // pre-evolution docs read null
      if (newFields.nonEmpty) publishSchemaDelta(fs, root, newFields)
    } else if (truncateFirst && fs.exists(schemaPathCheck)) {
      fs.delete(schemaPathCheck, false) // truncate redefines the table schema
      schemaDeltaFiles(fs, root).foreach { case (_, p) => fs.delete(p, false) }
    }

    writeFile(fs, new Path(staging, ManifestFile),
      manifestJson(queryId, epochId, tag, stats, tombstone), overwrite = true)
    val schemaPath = new Path(root, SchemaFile)
    if (!fs.exists(schemaPath)) {
      if (!tombstone) writeFile(fs, schemaPath, schema.json, overwrite = false)
      else { fs.delete(staging, true)
        throw new IllegalArgumentException(
          s"graft-doc: cannot delete from non-existent table $tablePath") }
    }

    // claim-CAS loop: win a seq via atomic create-exclusive, then rename
    var seq = commitDirs(fs, root).lastOption.map(_._1).getOrElse(0L) + 1
    var committed = false
    var attempts = 0
    while (!committed) {
      val claim = new Path(root, f"_claim_$seq%09d")
      val claimedAtNs = System.nanoTime()
      val won = createExclusive(fs, claim) // atomic, incl. the file scheme
      if (won && commitDirs(fs, root).exists(_._1 == seq)) {
        // stale win: the original claimant already renamed its commit and
        // released the claim while we were working from an older listing —
        // the seq is occupied by a DIR now; release and move past it.
        // (Safe against double-commit: only a claim holder creates the
        // seq's dir, we hold the claim, and the previous holder finished.)
        fs.delete(claim, false)
        attempts += 1
        seq += 1
      } else if (won) {
        val stall = postClaimStallMsForTest.getAndSet(0L)
        if (stall > 0) Thread.sleep(stall)
        // WRITER FENCE (checked on this writer's own monotonic clock, so
        // cross-machine clock skew cannot widen it): if more than half
        // the grace window elapsed between claiming this seq and reaching
        // the rename — GC pause, slow store, FS retries — a reader may be
        // about to step over the claim, and a rename landing after that
        // would be skipped forever. Abandon instead: LEAVE the claim file
        // (it blocks the seq from fresh re-claims that would land a
        // commit on a stepped-over seq; a later committer GCs it) and
        // retry on a fresh seq. The residual exposure is one rename
        // latency past the check, which the reader-side window's other
        // half absorbs along with clock skew.
        val elapsedMs = (System.nanoTime() - claimedAtNs) / 1000000L
        if (elapsedMs > writerFenceMs) {
          attempts += 1
          if (attempts > 4096) throw new java.io.IOException(
            s"graft-doc: writer fence kept abandoning seqs under $tablePath " +
              s"($attempts attempts; last elapsed ${elapsedMs}ms > fence ${writerFenceMs}ms)")
          seq += 1
        } else {
          val tomb = if (tombstone) "t" else ""
          val target = new Path(root, f"commit_$seq%09d$tomb%s_${staging.getName}")
          if (!fs.rename(staging, target))
            throw new java.io.IOException(
              s"graft-doc: commit rename failed: $staging -> $target")
          // the commit dir now occupies the seq; the claim has served its
          // arbitration purpose and would otherwise accumulate forever
          fs.delete(claim, false)
          committed = true
        }
      } else {
        attempts += 1
        if (attempts > 4096) throw new java.io.IOException(
          s"graft-doc: could not claim a commit seq under $tablePath after $attempts attempts")
        seq += 1
      }
    }
    if (epochId >= 0) writeEpochHw(fs, root, queryId, epochId, seq)
    // GC leaked claims (crashed or fenced-out writers): any claim whose
    // seq is below OUR committed dir can never be legitimately claimed
    // again (seq claiming always starts above the latest commit dir), so
    // removing it is safe once its writer is certainly not about to
    // rename. GC exists only to stop markers accumulating forever, so it
    // uses a cutoff 6× the grace window — a LIVE writer's claim (which
    // renames within the fence, ≤ grace/2 on its own monotonic clock) is
    // deleted early only if this committer's wall clock disagrees with
    // the store's mtime clock by more than 5.5 grace windows (>27 min at
    // defaults) — far beyond any NTP-managed skew, vs the single window
    // the old cutoff tolerated. Racing deletes with another committer's
    // GC is harmless — delete is idempotent here.
    try {
      val cutoff = System.currentTimeMillis() - 6 * DefaultClaimGraceMs
      fs.listStatus(root).foreach { s =>
        val n = s.getPath.getName
        if (s.isFile && n.startsWith("_claim_") &&
            n.stripPrefix("_claim_").toLong < seq &&
            s.getModificationTime < cutoff)
          fs.delete(s.getPath, false)
      }
    } catch { case _: Exception => () } // GC is best-effort housekeeping
    // prune an empty _staging/<writeId> parent left by streaming epochs
    val parent = staging.getParent
    if (parent.getName != "_staging" && fs.exists(parent) &&
        fs.listStatus(parent).isEmpty) fs.delete(parent, false)
  }

  private def claimFiles(fs: FileSystem, root: Path): Seq[Path] =
    fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("_claim_"))
      .map(_.getPath)

  /** Seq of the commit whose manifest carries `tag` (compaction uses this
    * to locate its own base commit instead of guessing from a re-list). */
  def findCommitSeqByTag(tablePath: String, tag: String): Option[Long] = {
    val (fs, root) = fsFor(tablePath)
    if (!fs.exists(root)) return None
    commitDirs(fs, root).reverseIterator.collectFirst {
      case (seq, dir) if {
        val m = new Path(dir, ManifestFile)
        fs.exists(m) &&
          TagRe.findFirstMatchIn(readFile(fs, m)).exists(mm => junstr(mm.group(1)) == tag)
      } => seq
    }
  }

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
