package graft.sources

import java.io.ByteArrayInputStream
import java.nio.file.Paths
import java.util.Base64

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name, xxhash64}
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.dsl

/** Per-FILE Bloom filters for the manifest-committed stores — the
  * POINT-LOOKUP axis of data skipping, orthogonal to both partition
  * pruning and [[FileStats]]' min/max ranges: a store hash-partitioned
  * by content bucket answers "which files can hold id X?" with neither
  * (the partition value is a content hash the caller can't derive from
  * X, and within a generation every file's id RANGE spans the whole
  * domain), while a membership sketch answers it in O(files) bit
  * probes. This is the bloom-filter file index production table
  * formats attach to high-cardinality columns for needle queries.
  *
  * Mechanics:
  *  - the sketch is Spark's own `BloomFilterAggregate` (surfaced as
  *    graft's `bloom_agg`, keys canonicalized by `Engine.hashKey` —
  *    numeric → double → string → XxHash64), built in ONE distributed
  *    pass per CAPACITY CLASS over the new generation's files grouped
  *    by `input_file_name()`: per-file cost is O(rows of that file),
  *    nothing corpus-sized;
  *  - capacity is sized from EACH FILE'S OWN parquet footer row count
  *    (metadata I/O only), quantized to the next power of two within
  *    [[MinItems]]..[[MaxItems]] at 8 bits per item (~2% FP, the same
  *    bits-per-key discipline as `q_bloom_prune`). Sizing from the
  *    file's own footer — never from whichever subset of files happens
  *    to need recording — makes every sidecar DETERMINISTIC: re-record
  *    one lost sidecar alone and its bytes match the original
  *    whole-generation recording (spec-pinned). Quantization bounds
  *    the number of distributed passes at the dozen power-of-two
  *    classes instead of one pass per distinct row count;
  *  - sidecars are PUBLISHED FROM THE EXECUTORS: each task writes its
  *    files' sketches straight through [[CatalogFs.publishIfAbsent]]
  *    in a `foreachPartition`, so the driver handles file PATHS only —
  *    a 10k-file generation never funnels gigabytes of bitsets
  *    through one driver `collect()`. (A [[CatalogFs]] used here must
  *    therefore publish to storage every executor reaches — true of
  *    the local impl in one JVM and of any DFS/object-store impl by
  *    construction.)
  *  - each data file gets one immutable base64 sidecar under
  *    `<base>/manifests/bloom/`, keyed by the hash of its committed
  *    path and published with the catalog's atomic create-if-absent —
  *    carried-forward files keep their sketch across later commits
  *    with zero maintenance, [[IndexCatalogOps.vacuum]] deletes a
  *    file's sidecar with the file, and a replayed recording is a
  *    no-op;
  *  - probing ([[prunePoint]]) hashes the lookup keys through the
  *    IDENTICAL canonicalization (one row-per-key local job), then
  *    tests each file's sketch (`BloomFilter.mightContainLong` — the
  *    exact bit probe `bloom_contains` runs per row). Deserialized
  *    sketches are CACHED across probes (sidecars are immutable once
  *    published, so the cache can never go stale; vacuum only ever
  *    DELETES sidecars of files no live manifest lists), LRU-bounded
  *    by bytes — a point-lookup service probing the same store reads
  *    each sidecar once, not once per query. No false negatives by
  *    the sketch contract; false positives only cost an extra file
  *    scan;
  *  - pruning is CONSERVATIVE: a file with no sidecar is always kept.
  *
  * 100 TB shape: a needle lookup (which shard holds doc X? is id X
  * already ingested?) resolves the manifest and probes each listed
  * file's sketch in catalog metadata — the engine then opens only the
  * (usually one) surviving file, instead of scanning every file of
  * the id's unknown bucket. Sidecars are written once per generation
  * at ingest, in one pass over data the writer just produced, each
  * from the task that holds the aggregated bits.
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

  /** A file's sketch capacity: its OWN footer row count, clamped to
    * [[MinItems]]..[[MaxItems]] and rounded up to a power of two — a
    * pure function of the file, so recording is deterministic no
    * matter which subset of files a (re-)record call covers.
    */
  private[graft] def capacityOf(rows: Long): Long = {
    val clamped = math.min(MaxItems, math.max(MinItems, rows))
    var c = MinItems
    while (c < clamped) c <<= 1
    math.min(c, MaxItems)
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
    * is inert metadata). One distributed pass per power-of-two
    * capacity class over the files that still need a sidecar, each
    * task publishing its own files' sketches; idempotent, so
    * crash-replayed writers never conflict.
    */
  def record(spark: SparkSession, base: String, files: Seq[String],
      column: String, fs: CatalogFs = LocalCatalogFs): Unit = {
    val todo = files.filterNot(f => fs.exists(bloomPath(base, f)))
    if (todo.isEmpty) return
    graft.Engine.register(spark) // bloom_agg resolution
    fs.mkdirs(bloomDir(base))
    // per-file capacity off the footers (metadata reads, no data
    // pages), then one pass per capacity class — bounded at the
    // handful of power-of-two classes, not per-file
    todo.groupBy(f => capacityOf(footerRows(f))).toSeq.sortBy(_._1)
      .foreach { case (nItems, group) =>
        // executors publish; only PATHS cross the driver boundary
        val sidecarOf = group.map(f => f -> bloomPath(base, f)).toMap
        spark.read.parquet(group: _*)
          .groupBy(input_file_name().as("file"))
          .agg(dsl.bloom_agg(col(column), nItems, 8L * nItems).as("bf"))
          .foreachPartition { rows: Iterator[Row] =>
            rows.foreach { r =>
              val f = fromUri(r.getString(0))
              // defensive: a NULL sketch (an empty aggregation group,
              // should one ever reach here) records no sidecar, so the
              // prune keeps the file conservatively
              Option(r.getAs[Array[Byte]]("bf")).foreach { bf =>
                val b64 = Base64.getEncoder.encodeToString(bf)
                fs.publishIfAbsent(sidecarOf(f), s"$column\t$b64")
              }
            }
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

  /** Parsed-sidecar cache: sidecar path → (bytes, column → sketch),
    * one cache per [[CatalogFs]] instance (weakly held, so a test's
    * throwaway in-memory fs takes its cache with it). Sound because a
    * published sidecar is IMMUTABLE — the only mutation anywhere is
    * vacuum's delete, which happens strictly after no live manifest
    * lists the file, and [[prunePoint]] only probes manifest-listed
    * files. LRU-bounded by decoded bytes so a million-file store
    * can't pin the driver heap; absence is never cached (a later
    * record may publish the sidecar).
    */
  private val CacheMaxBytes = 256L * 1024 * 1024
  private final class SketchCache {
    private var bytes = 0L
    private val m =
      new java.util.LinkedHashMap[String, (Long, Map[String, BloomFilter])](
        64, 0.75f, true) // access-order: iteration = LRU-first
    def get(path: String)(load: => Option[(Long, Map[String, BloomFilter])])
        : Option[Map[String, BloomFilter]] = synchronized {
      val hit = m.get(path)
      if (hit != null) Some(hit._2)
      else load.map { case (sz, parsed) =>
        m.put(path, (sz, parsed))
        bytes += sz
        val it = m.entrySet().iterator()
        while (bytes > CacheMaxBytes && it.hasNext) {
          val e = it.next()
          if (e.getKey != path) { bytes -= e.getValue._1; it.remove() }
        }
        parsed
      }
    }
    def drop(path: String): Unit = synchronized {
      val old = m.remove(path)
      if (old != null) bytes -= old._1
    }
  }
  private val caches = new java.util.WeakHashMap[CatalogFs, SketchCache]()
  private def cacheFor(fs: CatalogFs): SketchCache = caches.synchronized {
    var c = caches.get(fs)
    if (c == null) { c = new SketchCache; caches.put(fs, c) }
    c
  }

  /** The files of a manifest-resolved list a point lookup of `col IN
    * values` must read: files whose sketch might contain ANY of the
    * keys, plus (conservatively) every file without a sidecar. Parsed
    * sketches come from the per-fs cache — the second probe of a
    * store reads zero sidecar bytes (spec-pinned).
    */
  def prunePoint(spark: SparkSession, base: String, files: Seq[String],
      column: String, values: Seq[Long],
      fs: CatalogFs = LocalCatalogFs): Seq[String] = {
    if (values.isEmpty) return files
    lazy val hashes = hashKeys(spark, values)
    val cache = cacheFor(fs)
    files.filter { f =>
      val p = bloomPath(base, f)
      // existence is re-verified every probe (a metadata stat, never a
      // byte read) so an externally removed sidecar falls back to the
      // conservative keep instead of serving from cache; what the
      // cache saves is the read + decode of the sketch BYTES
      if (!fs.exists(p)) { cache.drop(p); true } // no sidecar: no pruning
      else cache.get(p) {
        try {
          val content = fs.readString(p)
          val parsed = content.split("\n").iterator.map(_.split("\t", 2))
            .collect { case Array(c, b64) =>
              c -> BloomFilter.readFrom(
                new ByteArrayInputStream(Base64.getDecoder.decode(b64)))
            }.toMap
          Some((content.length.toLong, parsed))
        } catch { // vanished between stat and read (racing vacuum): keep
          case _: Exception => None
        }
      } match {
        case None => true // sidecar vanished between stat and read: keep
        case Some(byCol) => byCol.get(column) match {
          case None => true // sidecar lacks this column: keep
          case Some(bf) => hashes.exists(bf.mightContainLong)
        }
      }
    }
  }
}
