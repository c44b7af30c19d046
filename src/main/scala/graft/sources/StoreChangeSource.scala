package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The catalog as a STREAMING SOURCE: a DataSource V2 connector that
  * FOLLOWS a manifest-committed store — `spark.readStream
  * .format("graft-store-changes").option("path", base).load()`.
  *
  * Offsets are committed VERSIONS (the numbers [[IndexCatalog]]
  * assigns), so the stream's progression is the store's commit
  * history: each micro-batch reads exactly the files version `end`
  * added over version `start` — the same manifest set algebra
  * `q_store_changes` answers once, lifted into Structured Streaming's
  * offset/checkpoint contract. What that buys at 100 TB:
  *  - a downstream consumer (replica sync, derived-index refresh,
  *    cache warmer) follows the store at O(delta) per batch — the
  *    corpus is never re-scanned, and an idle store yields no batch;
  *  - exactly-once across restarts for free: the committed version
  *    rides the query checkpoint, so a crashed consumer resumes at
  *    its last processed version (no files re-read, none skipped);
  *  - uncommitted generations are invisible by construction — the
  *    source lists MANIFESTS, not directories, so a torn write or an
  *    in-flight append never reaches a batch (the same guarantee the
  *    batch probes get);
  *  - [[SupportsTriggerAvailableNow]] caps a run at the version
  *    observed when the trigger fires, so maintenance jobs can drain
  *    "everything committed so far" and exit;
  *  - `.option("versionsPerBatch", k)` bounds how many commits one
  *    micro-batch spans (admission control, the maxFilesPerTrigger
  *    analogue): the default 0 drains the whole backlog in one batch
  *    (fast catch-up), `1` replays the history one manifest delta per
  *    batch — the granularity an incremental-fold consumer (matview
  *    refresh, per-commit census) keys its work on, without needing
  *    one engine start per commit.
  * Retention interacts the documented way: the checkpointed version
  * must stay inside the store's vacuum retention (a resume past the
  * horizon fails fast at manifest resolution, like any expired read).
  *
  * TWO MODES, picked by `.option("mode", …)`:
  *  - `append` (default) — the insert-only follower above: each batch
  *    is the files pure-append commits added; commits that removed
  *    files (maintenance rewrites, DML replacements) contribute
  *    nothing, because their files mix rewritten survivors with real
  *    changes (re-emitting them would re-deliver rows the consumer
  *    already saw).
  *  - `cdc` — the ROW-LEVEL change-data feed: every commit streams
  *    its manifest diff as side-tagged pre/post images — the files
  *    the commit REMOVED (`side = 'old'`) and ADDED (`side = 'new'`),
  *    each row carrying its commit `version`. Offsets are versions,
  *    so both sides of a commit always land in the SAME micro-batch;
  *    a consumer classifies them with one full-outer join on
  *    (version, vec_id) — insert / delete / update pre+post, with
  *    rewritten SURVIVORS (both sides identical) cancelling out — the
  *    exact classification the batch `table_changes` probe
  *    (`q_store_cdc`) computes, shared as
  *    `SimilarityQueries.classifyChanges`. Per-batch cost is
  *    O(touched partitions' files): a DML commit streams the
  *    replaced partitions, never the store (a full REWRITE streams
  *    everything, which is what a rewrite is). This is how a
  *    downstream replica follows DML, not just appends, without the
  *    store writing any change log at commit time.
  *
  * Scope: rows decode through a self-contained parquet-hadoop reader
  * for the embedding-store schema (`vec_id BIGINT, embedding
  * ARRAY<FLOAT>, nrm DOUBLE` + the Hive `bucket=` partition value
  * parsed from each file's path). The connector's substance is the
  * offset/manifest protocol — a general-schema reader would
  * re-implement Spark's vectorized parquet decode, which a production
  * port would delegate to the built-in parquet scan behind the same
  * stream.
  */
class StoreChangeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-store-changes"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StoreChangeSource.schemaFor(
      Option(options.get("mode")).getOrElse("append"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // Spark hands getTable the ORIGINAL-cased option map (inferSchema
    // got the case-insensitive wrapper): a raw properties.get here
    // would silently drop a user's "Mode"/"STARTINGVERSION" spelling —
    // the stream would run in append mode against the CDC schema the
    // inference just promised, or start at 0 instead of the requested
    // version. Re-wrap so both hooks read options the same way.
    val opts = new CaseInsensitiveStringMap(properties)
    val base = opts.get("path")
    require(base != null && base.nonEmpty,
      "graft-store-changes requires .option(\"path\", <store base dir>)")
    val mode = Option(opts.get("mode")).getOrElse("append")
    require(mode == "append" || mode == "cdc",
      s"graft-store-changes mode must be 'append' or 'cdc', got '$mode'")
    val vpb = Option(opts.get("versionsPerBatch")).map(_.trim.toInt).getOrElse(0)
    require(vpb >= 0,
      s"graft-store-changes versionsPerBatch must be >= 0, got $vpb")
    new StoreChangeTable(base,
      Option(opts.get("startingVersion")).getOrElse("0"), mode, vpb)
  }
}

object StoreChangeSource {
  /** The embed store's row schema; `bucket` is the Hive partition
    * value each file's path carries.
    */
  val Schema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("nrm", DoubleType),
    StructField("bucket", LongType)))

  /** cdc mode prefixes every row with its commit version and diff
    * side (`old` = a removed file's row, the pre-state; `new` = an
    * added file's row, the post-state).
    */
  val CdcSchema: StructType = StructType(
    StructField("version", LongType) +: StructField("side", StringType) +:
      Schema.fields.toSeq)

  private[sources] def schemaFor(mode: String): StructType =
    if (mode == "cdc") CdcSchema else Schema
}

private[sources] class StoreChangeTable(base: String, startingVersion: String,
    mode: String, versionsPerBatch: Int = 0) extends Table with SupportsRead {
  override def name(): String = s"graft-store-changes($base,$mode)"
  override def schema(): StructType = StoreChangeSource.schemaFor(mode)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = StoreChangeSource.schemaFor(mode)
        override def toBatch: Batch =
          throw new UnsupportedOperationException(
            "graft-store-changes is a streaming source; batch reads go " +
              "through the manifest-resolved parquet scan")
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new StoreChangeStream(base, startingVersion, mode, versionsPerBatch)
      }
    }
}

/** One store-following stream: offset v = "everything up to committed
  * version v". Version 0 is the empty store.
  *
  * `startingVersion` picks where a FRESH consumer joins the history
  * (a checkpointed restart always resumes at its own offset):
  * `"0"` (default) consumes the whole store — first batch is
  * everything committed so far; `"latest"` tail-follows — only
  * commits AFTER stream start are seen; an integer `v` joins
  * mid-history, consuming deltas from version `v` exclusive. The
  * named version must still be inside vacuum retention, the same
  * horizon rule any as-of read has.
  */
private[sources] class StoreChangeStream(base: String, startingVersion: String,
    mode: String = "append", versionsPerBatch: Int = 0)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private case class V(v: Int) extends Offset {
    override def json(): String = v.toString
  }

  // AvailableNow cap: fixed at trigger time so the run drains exactly
  // the versions committed before it started, then terminates
  private var cap: Int = -1

  // readableVersion, not currentVersion: an in-doubt multi-store txn
  // prepare at the head is invisible to readers until decided, and a
  // follower must not plan a batch over an undecidable resolution.
  // (A decided-abort slot inside a planned range diffs to nothing.)
  override def prepareForTriggerAvailableNow(): Unit =
    cap = IndexCatalog.readableVersion(base)

  override def initialOffset(): Offset = startingVersion match {
    case "latest" => V(IndexCatalog.readableVersion(base))
    case v => V(v.trim.toInt)
  }

  override def latestOffset(): Offset =
    V(if (cap >= 0) cap else IndexCatalog.readableVersion(base))

  // SupportsTriggerAvailableNow extends SupportsAdmissionControl. A
  // version is all-or-nothing (no finer rate knob exists), but the
  // number of versions one micro-batch spans IS a knob:
  // `versionsPerBatch = 0` (default) drains everything committed up
  // to the cap in one batch — the fast catch-up posture a consumer
  // resuming after a long lag wants — while `versionsPerBatch = k`
  // admits at most k commits per micro-batch, so a drain REPLAYS the
  // commit history at that granularity (k = 1: one batch per manifest
  // delta, the per-commit fold the matview/follower lifecycles
  // process). Engine-side this is the same admission-control contract
  // maxFilesPerTrigger gives the file source under AvailableNow: the
  // trigger loops micro-batches until the prepared cap is reached.
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val head = if (cap >= 0) cap else IndexCatalog.readableVersion(base)
    val s = start.asInstanceOf[V].v
    V(if (versionsPerBatch <= 0) math.max(head, s)
      else math.max(s, math.min(head, s + versionsPerBatch)))
  }

  override def deserializeOffset(json: String): Offset = V(json.trim.toInt)

  /** The batch's files, walked VERSION BY VERSION so commit TYPE
    * decides what streams: a pure-append step (no predecessor file
    * removed) contributes its added files — new rows; a step that
    * removed files is content-preserving MAINTENANCE (compaction /
    * partition-scoped compaction rewrite the same rows into a fresh
    * layout) and contributes nothing — emitting its files would
    * re-deliver every rewritten row to a consumer that already saw
    * them. A naive files(end)∖files(start) diff would do exactly
    * that re-delivery on the first compaction. (Content-CHANGING
    * replacement commits — row-level DELETE, a MERGE touching stored
    * rows, the cluster-assignment store's label rewrites — need a
    * row-level CDC consumer and are outside this follower's
    * insert-only contract; a MERGE that matched nothing and landed
    * only in so-far-empty buckets removes no file, so it IS a pure
    * append and streams.) The walk only touches live
    * manifests; vacuum expires a PREFIX of versions, so if `start`
    * itself expired the consumer outlived retention and resolution
    * fails fast.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[V].v, end.asInstanceOf[V].v)
    def bucketOf(f: String): Long = IndexCatalog.partitionKey(f) match {
      case Some(k) if k.startsWith("bucket=") =>
        k.stripPrefix("bucket=").toLong
      case other => throw new IllegalStateException(
        s"store file without a bucket= partition: $f ($other)")
    }
    // one manifest resolution per version in the range, shared by both
    // sides of every step's diff — carried as a SLIDING (prev, cur)
    // pair, never a whole-range map: a consumer catching up V versions
    // of an N-file store would otherwise hold V full file lists on the
    // driver at once (checkpoints bound each resolution's cost, but
    // nothing bounds V x N retention except this fold)
    def filesOf(v: Int): Seq[String] =
      if (v == 0) Seq.empty[String] else IndexCatalog.files(base, v)
    var prevList = filesOf(s)
    (s + 1 to e).flatMap { v =>
      val prev = prevList.toSet
      val cur = filesOf(v)
      prevList = cur
      val removed = (prev -- cur.toSet).toSeq.sorted
      val added = cur.filterNot(prev).sorted
      if (mode == "cdc")
        // every commit streams its side-tagged manifest diff; the
        // consumer's (version, vec_id) full-outer classify cancels
        // rewritten survivors, so maintenance still nets to zero rows
        removed.map(f => StoreFilePartition(f, bucketOf(f), v, "old")) ++
          added.map(f => StoreFilePartition(f, bucketOf(f), v, "new"))
      else if (removed.nonEmpty) Seq.empty // append mode: skip non-append
      else added.map(f => StoreFilePartition(f, bucketOf(f)))
    }.map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StoreFileReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One committed data file (+ its partition value) — the unit of
  * parallelism; executors read files independently. `version`/`side`
  * are set (and prefixed onto every row) only in cdc mode.
  */
private[sources] case class StoreFilePartition(file: String, bucket: Long,
    version: Int = 0, side: String = "")
  extends InputPartition

private[sources] class StoreFileReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new StoreFileReader(partition.asInstanceOf[StoreFilePartition])
}

/** parquet-hadoop Group decode of one store file: (vec_id BIGINT,
  * embedding ARRAY<FLOAT>, nrm DOUBLE) + the partition's constant
  * bucket — prefixed by the constant (version, side) in cdc mode.
  * Spark writes arrays as the standard 3-level LIST shape
  * (`embedding.list.element`).
  */
private[sources] class StoreFileReader(p: StoreFilePartition)
    extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new HPath(p.file))
      .withConf(StoreFileReader.conf)
      .build()

  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val g = current
    val vecId = g.getLong("vec_id", 0)
    val lst = g.getGroup("embedding", 0)
    val n = lst.getFieldRepetitionCount("list")
    val floats = new Array[Float](n)
    var i = 0
    while (i < n) {
      floats(i) = lst.getGroup("list", i).getFloat("element", 0)
      i += 1
    }
    val nrm = g.getDouble("nrm", 0)
    val data = Array[Any](vecId, ArrayData.toArrayData(floats), nrm, p.bucket)
    if (p.side.isEmpty) new GenericInternalRow(data)
    else new GenericInternalRow(
      Array[Any](p.version.toLong,
        org.apache.spark.unsafe.types.UTF8String.fromString(p.side)) ++ data)
  }

  override def close(): Unit = reader.close()
}

private[sources] object StoreFileReader {
  /** One JVM-wide Hadoop conf for the group readers: `new
    * Configuration()` re-parses the default XML resources, and the old
    * per-file construction charged that to every partition read.
    * Read-only here, so sharing across reader threads is safe.
    */
  private[sources] lazy val conf = new Configuration()
}
