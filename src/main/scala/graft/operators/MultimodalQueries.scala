package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.multimodal.{ImageCodec, Multimodal, WavCodec}

/** Query surface for the multimodal module. All four queries are
  * oracle-checked: metadata extraction (q_multimodal_meta), the real
  * image codec round trip (q_image_decode — decoded dimensions are
  * predictable), the real audio codec round trip (q_audio_decode —
  * decoded PCM sample statistics are predictable), and the
  * mixed-corpus feature profile (q_media_profile — per-type columns
  * restricted to decode contracts). The stubbed-codec (compressed
  * audio / video) feature path stays spec-only in MultimodalSpec
  * (fake decode, not SQL-expressible).
  */
object MultimodalQueries {

  /** Metadata extraction over the opaque binary column: sizes, content
    * hash, payload head — the operations that stay engine-side even when
    * real codecs run in the decode stage.
    */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val docs = Engine.table(spark, dir, "documents")
    val bin = col("text").cast("binary")
    docs.select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("media_type"),
        col("source"),
        octet_length(bin).cast("long").as("n_bytes"),
        sha2(bin, 256).as("sha256_hex"),
        base64(substring(col("text"), 1, 8).cast("binary")).as("head8_b64"))
      .orderBy("media_id")
  }

  /** Number of synthetic PNG fixtures for the real-codec round trip. */
  private val NImages = 64

  /** Number of synthetic PCM WAV fixtures for the audio round trip. */
  private val NAudio = 48

  /** Deterministic PCM16 WAV corpus: the i-th item has sample rate
    * `8000 + 1000*(i%4)`, `1 + i%2` channels, `64 + 8*i` frames per
    * channel, and interleaved samples `((k*37 + i*11) % 997) - 498` —
    * every field (including the exact byte size, 44 + frames*ch*2, and
    * the sum of |sample|) is closed-form, so a SQL oracle can predict
    * what the REAL decoder must recover from the bytes.
    */
  private def audioItems(spark: SparkSession) = {
    import spark.implicits._
    spark.range(NAudio).map { i =>
      val ii = i.toInt
      val sampleRate = 8000 + 1000 * (ii % 4)
      val channels = 1 + (ii % 2)
      val frames = 64 + 8 * ii
      val samples = Array.tabulate(frames * channels)(k =>
        (((k * 37 + ii * 11) % 997) - 498).toShort)
      Multimodal.MediaItem(i, "audio/wav", "synthetic", 0L,
        WavCodec.encodePcm16(sampleRate, channels, samples))
    }
  }

  /** Feature profile over a MIXED media corpus through the full typed
    * pipeline: the documents table as `text/plain`, [[NImages]]
    * deterministic PNGs decoded by the REAL image codec, and
    * [[NAudio]] deterministic PCM WAVs decoded by the REAL audio
    * codec. Each profile column is emitted only for the types where
    * its value is a decode contract rather than a codec artifact —
    * total_bytes for text and audio (byte length is exact: WAV is
    * 44 + frames*channels*2 by construction), dims and frame count
    * for images (pixels) and audio (sample rate / channels /
    * per-channel samples), content distinctness for all — so the
    * whole profile is rows+schema+hash checkable. (PNG byte size
    * would depend on the encoder's compression choices: deliberately
    * not exposed. Compressed audio / video remain the stub codec,
    * covered by MultimodalSpec — no codec libs in this container.)
    */
  def qMediaProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val text = Multimodal.mediaFromDocuments(spark, dir)
    val images = spark.range(NImages).map { i =>
      val w = 16 + (i % 32).toInt
      val h = 8 + (i % 16).toInt
      Multimodal.MediaItem(i, "image/png", "synthetic", 0L,
        ImageCodec.encodePng(w, h, i))
    }
    val feats = Multimodal.decodeFeatures(
      text.union(images).union(audioItems(spark))).toDF()
    val dimTypes = Seq("image/png", "audio/wav")
    feats
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("sum_bytes"),
        min(col("width")).as("mnw"), max(col("width")).as("mxw"),
        min(col("height")).as("mnh"), max(col("height")).as("mxh"),
        sum(col("n_frames")).as("frames"),
        countDistinct(col("checksum")).as("n_distinct_content"))
      .select(
        col("media_type"), col("n_items"),
        when(col("media_type").isin("text/plain", "audio/wav"), col("sum_bytes"))
          .cast("long").as("total_bytes"),
        when(col("media_type").isin(dimTypes: _*), col("mnw"))
          .cast("long").as("min_w"),
        when(col("media_type").isin(dimTypes: _*), col("mxw"))
          .cast("long").as("max_w"),
        when(col("media_type").isin(dimTypes: _*), col("mnh"))
          .cast("long").as("min_h"),
        when(col("media_type").isin(dimTypes: _*), col("mxh"))
          .cast("long").as("max_h"),
        when(col("media_type").isin(dimTypes: _*), col("frames"))
          .cast("long").as("n_frames"),
        col("n_distinct_content"))
      .orderBy("media_type")
  }

  /** REAL audio decode through the distributed pipeline: encode
    * deterministic PCM WAVs, decode them on executors with the real
    * RIFF/PCM parser, and emit per-item facts INCLUDING a sample-level
    * aggregate (sum and truncated mean of |sample|) — values the
    * oracle derives arithmetically from the generation formula, so a
    * header-only "decode" cannot fake them. The audio analogue of
    * [[qImageDecode]].
    */
  def qAudioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioItems(spark)
      .map { it =>
        val info = WavCodec.decode(it.content).getOrElse(
          sys.error(s"undecodable WAV fixture ${it.media_id}"))
        // a structurally valid WAV may carry an empty data chunk
        // (nFrames = 0): mean over zero samples is defined as 0, not
        // an ArithmeticException from the executor
        val nSamples = info.nFrames.toLong * info.channels
        val meanAbs = if (nSamples == 0) 0L else info.sumAbs / nSamples
        (it.media_id, info.sampleRate.toLong, info.channels.toLong,
          info.nFrames.toLong, info.sumAbs, meanAbs)
      }
      .toDF("media_id", "sample_rate", "channels", "n_frames", "sum_abs", "mean_abs")
      .orderBy("media_id")
  }

  /** Items in the perceptual-hash corpus: 24 distinct images, each
    * present TWICE (byte-identical duplicate pairs i and i+24).
    */
  private val NPhash = 48

  /** Perceptual-hash image dedup through the real codec: encode 24
    * distinct PNGs twice each (byte-identical pairs), decode on
    * executors, compute a 64-bit integer average-hash
    * ([[ImageCodec.averageHash]] — all-integer, so it's a pure
    * function of decoded pixels), and cluster on
    * (width, height, phash) — dims in the blocking key the way a real
    * image-dedup pipeline buckets by size/aspect before comparing
    * hashes, and what keeps the ORACLE closed-form: byte-identical
    * pairs always share a hash, distinct-seed groups can never merge
    * across different dims even if their 64-bit hashes collided. The
    * oracle predicts the full cluster structure arithmetically
    * (canonical s, member s+24, size 2 for s < 24). Scale shape:
    * decode+hash is a narrow map (bytes never cross a shuffle), the
    * cluster groupBy carries 16 bytes per image. The hash itself (not
    * oracle-predictable — it depends on PNG codec output) is checked
    * in MultimodalSpec: resize-robustness by hamming distance, and
    * exact equality on byte-identical pairs.
    */
  def qImagePhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.range(NPhash)
      .map { i =>
        val s = (i % 24).toInt
        Multimodal.MediaItem(i, "image/png", "synthetic", 0L,
          ImageCodec.encodePng(16 + s, 8 + s, s))
      }
      .map { it =>
        val img = ImageCodec.decodeImage(it.content).getOrElse(
          sys.error(s"undecodable PNG fixture ${it.media_id}"))
        (it.media_id, img.getWidth.toLong, img.getHeight.toLong,
          ImageCodec.averageHash(img))
      }
      .toDF("media_id", "width", "height", "phash")
      .groupBy(col("width"), col("height"), col("phash"))
      .agg(
        min(col("media_id")).as("canonical_id"),
        max(col("media_id")).as("max_id"),
        count(lit(1)).as("n_members"))
      .select(col("width"), col("height"), col("canonical_id"),
        col("max_id"), col("n_members"))
      .orderBy("canonical_id")
  }

  /** REAL image decode + resize through the full distributed pipeline:
    * encode deterministic PNGs of known size (JDK `javax.imageio`),
    * run them through the Dataset decode stage, pixel-space resize to
    * half size, decode again — and emit the decoded dimensions, which
    * the oracle predicts arithmetically. The codec work is genuine
    * PNG encode/decode on executors; only the image CONTENT is
    * synthetic.
    */
  def qImageDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cached: both the decode branch and the resize branch consume the
    // same synthetic items — without this each branch re-encodes all
    // PNGs from scratch
    val items = spark.range(NImages).map { i =>
      val w = 16 + (i % 32).toInt
      val h = 8 + (i % 16).toInt
      Multimodal.MediaItem(i, "image/png", "synthetic", 0L,
        ImageCodec.encodePng(w, h, i))
    }.cache()
    val decoded = Multimodal.decodeFeatures(items).toDF()
      .select(col("media_id"), col("width"), col("height"))
    // per-item half-size resize, then decode the resized PNG again
    val halved = Multimodal.decodeFeatures(
      items.map { it =>
        ImageCodec.decodeDims(it.content) match {
          case Some((w, h)) =>
            Multimodal.Codec.resize(it, math.max(1, w / 2), math.max(1, h / 2))
          case None => it
        }
      }).toDF()
      .select(col("media_id"), col("width").as("half_w"), col("height").as("half_h"))
    decoded.join(halved, "media_id")
      .select(col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("half_w").cast("long").as("half_w"),
        col("half_h").cast("long").as("half_h"))
      .orderBy("media_id")
  }

  /** Raw-blob ingestion through Spark's `binaryFile` source — the step
    * every multimodal pipeline STARTS with: media lands in an object
    * store as path-addressed files, and the first job turns
    * `(path, length, content)` rows into the binary-column tables the
    * rest of this surface consumes. The read is the built-in
    * `binaryFile` FileFormat (one row per file, never split
    * intra-file; `maxPartitionBytes` packs small files per task, so a
    * billion-blob bucket fans out across executors with no driver
    * listing loop beyond the FileIndex), `pathGlobFilter` prunes
    * non-media files AT LISTING time (the decoy README in the fixture
    * dir never reaches an executor), the id is parsed from the path,
    * and the dimensions come from REALLY decoding the content bytes
    * through `javax.imageio` — a truncated or swapped payload fails
    * loudly rather than passing a metadata-only census. Oracle: the
    * PNG fixtures are generated from the same closed-form dims as
    * `q_image_decode`, so DuckDB replays the id→(w, h) algebra.
    */
  def qBinaryIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobDir = java.nio.file.Files.createTempDirectory("graft_blobs").toString
    try {
      (0L until NImages).foreach { i =>
        val w = 16 + (i % 32).toInt
        val h = 8 + (i % 16).toInt
        java.nio.file.Files.write(
          java.nio.file.Paths.get(blobDir, f"img-$i%04d.png"),
          ImageCodec.encodePng(w, h, i))
      }
      // the decoy the glob must exclude at listing time
      java.nio.file.Files.write(
        java.nio.file.Paths.get(blobDir, "README.txt"),
        "not an image".getBytes("UTF-8"))
    } catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(blobDir)); throw e
    }
    graft.Lease.lease("q_binary_ingest", Seq(blobDir))
    val items = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(blobDir)
      .select(
        regexp_extract(col("path"), "img-(\\d+)\\.png$", 1)
          .cast("long").as("media_id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        Multimodal.MediaItem(id, "image/png", "blob-store", bytes.length.toLong, bytes)
      }
    Multimodal.decodeFeatures(items).toDF()
      .select(col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy("media_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_media_profile" -> (qMediaProfile _),
    "q_image_decode" -> (qImageDecode _),
    "q_audio_decode" -> (qAudioDecode _),
    "q_image_phash" -> (qImagePhash _),
    "q_binary_ingest" -> (qBinaryIngest _)
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'text/plain' AS media_type, source,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       sha256(text) AS sha256_hex,
        |       to_base64(CAST(substr(text, 1, 8) AS BLOB)) AS head8_b64
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_media_profile" ->
      s"""WITH txt AS (
         |  SELECT 'text/plain' AS media_type,
         |         count(*) AS n_items,
         |         CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
         |         CAST(NULL AS BIGINT) AS min_w, CAST(NULL AS BIGINT) AS max_w,
         |         CAST(NULL AS BIGINT) AS min_h, CAST(NULL AS BIGINT) AS max_h,
         |         CAST(NULL AS BIGINT) AS n_frames,
         |         count(DISTINCT text) AS n_distinct_content
         |  FROM documents),
         |img AS (
         |  SELECT 'image/png' AS media_type,
         |         count(*) AS n_items,
         |         CAST(NULL AS BIGINT) AS total_bytes,
         |         CAST(min(16 + i % 32) AS BIGINT) AS min_w,
         |         CAST(max(16 + i % 32) AS BIGINT) AS max_w,
         |         CAST(min(8 + i % 16) AS BIGINT) AS min_h,
         |         CAST(max(8 + i % 16) AS BIGINT) AS max_h,
         |         CAST(count(*) AS BIGINT) AS n_frames,
         |         count(DISTINCT i) AS n_distinct_content
         |  FROM generate_series(0, ${NImages - 1}) AS t(i)),
         |aud AS (
         |  SELECT 'audio/wav' AS media_type,
         |         count(*) AS n_items,
         |         CAST(sum(44 + (64 + 8*i) * (1 + i % 2) * 2) AS BIGINT) AS total_bytes,
         |         CAST(min(8000 + 1000 * (i % 4)) AS BIGINT) AS min_w,
         |         CAST(max(8000 + 1000 * (i % 4)) AS BIGINT) AS max_w,
         |         CAST(min(1 + i % 2) AS BIGINT) AS min_h,
         |         CAST(max(1 + i % 2) AS BIGINT) AS max_h,
         |         CAST(sum(64 + 8*i) AS BIGINT) AS n_frames,
         |         count(DISTINCT i) AS n_distinct_content
         |  FROM generate_series(0, ${NAudio - 1}) AS t(i))
         |SELECT * FROM aud UNION ALL SELECT * FROM img UNION ALL SELECT * FROM txt
         |ORDER BY media_type""".stripMargin,
    "q_audio_decode" ->
      s"""WITH params AS (
         |  SELECT i, 8000 + 1000 * (i % 4) AS rate, 1 + i % 2 AS ch,
         |         64 + 8*i AS frames
         |  FROM generate_series(0, ${NAudio - 1}) AS t(i)),
         |sums AS (
         |  SELECT i, CAST(sum(abs(((k * 37 + i * 11) % 997) - 498)) AS BIGINT) AS sum_abs
         |  FROM params, unnest(generate_series(0, frames * ch - 1)) AS u(k)
         |  GROUP BY i)
         |SELECT p.i AS media_id, CAST(rate AS BIGINT) AS sample_rate,
         |       CAST(ch AS BIGINT) AS channels, CAST(frames AS BIGINT) AS n_frames,
         |       s.sum_abs, CAST(s.sum_abs // (frames * ch) AS BIGINT) AS mean_abs
         |FROM params p JOIN sums s ON p.i = s.i
         |ORDER BY media_id""".stripMargin,
    "q_binary_ingest" ->
      s"""SELECT i AS media_id,
         |       CAST(16 + i % 32 AS BIGINT) AS width,
         |       CAST(8 + i % 16 AS BIGINT) AS height
         |FROM generate_series(0, ${NImages - 1}) AS t(i)
         |ORDER BY media_id""".stripMargin,
    "q_image_decode" ->
      s"""SELECT i AS media_id,
         |       CAST(16 + i % 32 AS BIGINT) AS width,
         |       CAST(8 + i % 16 AS BIGINT) AS height,
         |       CAST(greatest(1, (16 + i % 32) // 2) AS BIGINT) AS half_w,
         |       CAST(greatest(1, (8 + i % 16) // 2) AS BIGINT) AS half_h
         |FROM generate_series(0, ${NImages - 1}) AS t(i)
         |ORDER BY media_id""".stripMargin,
    // the cluster structure is closed-form: seed s < 24 appears as
    // items s and s+24 (byte-identical), dims (16+s, 8+s) make the
    // blocking key unique per seed
    "q_image_phash" ->
      """SELECT CAST(16 + s AS BIGINT) AS width,
        |       CAST(8 + s AS BIGINT) AS height,
        |       CAST(s AS BIGINT) AS canonical_id,
        |       CAST(s + 24 AS BIGINT) AS max_id,
        |       CAST(2 AS BIGINT) AS n_members
        |FROM generate_series(0, 23) AS t(s)
        |ORDER BY canonical_id""".stripMargin
  )
}
