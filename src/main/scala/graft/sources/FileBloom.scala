package graft.sources

import java.io.ByteArrayInputStream
import java.nio.file.Paths
import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name, xxhash64}
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.dsl

/** Per-FILE Bloom filters for the manifest-committed stores — the
  * POINT-LOOKUP axis of data skipping, orthogonal to both partition
  * pruning and [[FileStats]]' min/max ranges: a store hash-partitioned
  * by content bucket answers "which files can hold id X?" with neither
  * (the partition value is a content hash the caller can't derive from
  * X, and within a generation every file's id RANGE spans the whole
  * domain), while a membership sketch answers it in O(files) driver-
  * side bit probes. This is the bloom-filter file index production
  * table formats attach to high-cardinality columns for needle
  * queries.
  *
  * Mechanics:
  *  - the sketch is Spark's own `BloomFilterAggregate` (surfaced as
  *    graft's `bloom_agg`, keys canonicalized by `Engine.hashKey` —
  *    numeric → double → string → XxHash64), built in ONE distributed
  *    pass over the new generation's files grouped by
  *    `input_file_name()`: per-file cost is O(rows of that file),
  *    nothing corpus-sized;
  *  - capacity is sized from the parquet FOOTERS' row counts (metadata
  *    I/O only): 8 bits per row of the largest recorded file — the
  *    same bits-per-key discipline as `q_bloom_prune` (~2% FP), so a
  *    sidecar is ~1 byte per row of its file;
  *  - each data file gets one immutable base64 sidecar under
  *    `<base>/manifests/bloom/`, keyed by the hash of its committed
  *    path and published with the catalog's atomic create-if-absent —
  *    carried-forward files keep their sketch across later commits
  *    with zero maintenance, [[IndexCatalogOps.vacuum]] deletes a
  *    file's sidecar with the file, and a replayed recording is a
  *    no-op;
  *  - probing ([[prunePoint]]) hashes the lookup keys through the
  *    IDENTICAL canonicalization (one row-per-key local job), then
  *    tests each file's deserialized sketch driver-side
  *    (`BloomFilter.mightContainLong` — the exact bit probe
  *    `bloom_contains` runs per row). No false negatives by the
  *    sketch contract; false positives only cost an extra file scan;
  *  - pruning is CONSERVATIVE: a file with no sidecar is always kept.
  *
  * 100 TB shape: a needle lookup (which shard holds doc X? is id X
  * already ingested?) resolves the manifest and probes each listed
  * file's sketch in catalog metadata — the engine then opens only the
  * (usually one) surviving file, instead of scanning every file of
  * the id's unknown bucket. Sidecars are written once per generation
  * at ingest, in one pass over data the writer just produced.
  */
object FileBloom {

  /** Capacity floor/ceiling for the per-file sketch: at least 1024
    * expected items (tiny files still get a full-width sketch), at
    * most 4M (beyond that FP degrades gracefully instead of the
    * sidecar growing unbounded — `q_bloom_prune`'s ceiling).
    */
  private val MinItems = 1024L
  private val MaxItems = 4L * 1000 * 1000

  private[sources] def bloomDir(base: String): String =
    Paths.get(base, "manifests", "bloom").toString

  /** The sidecar path for a committed data file — keyed like
    * [[FileStats.statsPath]] by the hash of the committed path, so the
    * mapping survives every later commit that carries the file.
    */
  def bloomPath(base: String, dataFile: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
      .digest(dataFile.getBytes("UTF-8"))
    Paths.get(bloomDir(base), d.map("%02x".format(_)).mkString + ".txt").toString
  }

  /** Row count of a parquet file from its footer — metadata I/O only. */
  private def footerRows(file: String): Long = {
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        new org.apache.hadoop.conf.Configuration()))
    try rdr.getRecordCount finally rdr.close()
  }

  /** `input_file_name()` renders a URI (`file:///…`); committed paths
    * are plain. Normalize to the committed form.
    */
  private def fromUri(name: String): String =
    if (name.startsWith("file:")) Paths.get(java.net.URI.create(name)).toString
    else name

  /** Record Bloom sidecars over `col` for freshly committed data
    * files (call after the write, alongside [[FileStats.record]];
    * visibility is the manifest's — a sidecar for an uncommitted file
    * is inert metadata). One distributed pass over the files that
    * still need a sidecar; idempotent, so crash-replayed writers
    * never conflict.
    */
  def record(spark: SparkSession, base: String, files: Seq[String],
      column: String, fs: CatalogFs = LocalCatalogFs): Unit = {
    val todo = files.filterNot(f => fs.exists(bloomPath(base, f)))
    if (todo.isEmpty) return
    graft.Engine.register(spark) // bloom_agg resolution
    fs.mkdirs(bloomDir(base))
    // capacity from footer row counts: 8 bits per row of the largest
    // file — metadata reads, no data pages
    val nItems = math.min(MaxItems,
      math.max(MinItems, todo.map(footerRows).max))
    val sketches = spark.read.parquet(todo: _*)
      .groupBy(input_file_name().as("file"))
      .agg(dsl.bloom_agg(col(column), nItems, 8L * nItems).as("bf"))
      .collect() // one row per new file — generation-sized, not corpus-sized
    sketches.foreach { r =>
      val f = fromUri(r.getString(0))
      // defensive: a NULL sketch (an empty aggregation group, should
      // one ever reach here) records no sidecar, so the prune keeps
      // the file conservatively instead of this loop crashing
      Option(r.getAs[Array[Byte]]("bf")).foreach { bf =>
        val b64 = Base64.getEncoder.encodeToString(bf)
        fs.publishIfAbsent(bloomPath(base, f), s"$column\t$b64")
      }
    }
  }

  /** The hash each sketch actually holds for a raw key — the same
    * canonicalization `bloom_agg`/`bloom_contains` apply
    * (`Engine.hashKey`: numeric → double → string → XxHash64), run
    * through the engine itself on a row-per-key local frame so the
    * bits can never drift from the insert path.
    */
  private def hashKeys(spark: SparkSession, values: Seq[Long]): Seq[Long] = {
    import spark.implicits._
    values.toDF("v")
      .select(xxhash64(col("v").cast("double").cast("string")).as("h"))
      .collect().map(_.getLong(0)).toSeq
  }

  /** The files of a manifest-resolved list a point lookup of `col IN
    * values` must read: files whose sketch might contain ANY of the
    * keys, plus (conservatively) every file without a sidecar.
    */
  def prunePoint(spark: SparkSession, base: String, files: Seq[String],
      column: String, values: Seq[Long],
      fs: CatalogFs = LocalCatalogFs): Seq[String] = {
    if (values.isEmpty) return files
    lazy val hashes = hashKeys(spark, values)
    files.filter { f =>
      val p = bloomPath(base, f)
      if (!fs.exists(p)) true // conservative: no sidecar, no pruning
      else fs.readString(p).split("\n").iterator.map(_.split("\t", 2))
        .collectFirst { case Array(c, b64) if c == column =>
          val bf = BloomFilter.readFrom(
            new ByteArrayInputStream(Base64.getDecoder.decode(b64)))
          hashes.exists(bf.mightContainLong)
        }.getOrElse(true) // sidecar lacks this column: keep
    }
  }
}
