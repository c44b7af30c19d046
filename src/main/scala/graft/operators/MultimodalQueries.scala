package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.multimodal.{ImageCodec, Multimodal}

/** Query surface for the multimodal module. All three queries are
  * oracle-checked: metadata extraction (q_multimodal_meta), the real
  * image codec round trip (q_image_decode — decoded dimensions are
  * predictable), and the mixed-corpus feature profile
  * (q_media_profile — per-type columns restricted to decode
  * contracts). The stubbed-codec (audio/video) feature path stays
  * spec-only in MultimodalSpec (fake decode, not SQL-expressible).
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

  /** Feature profile over a MIXED media corpus through the full typed
    * pipeline: the documents table as `text/plain` plus [[NImages]]
    * deterministic PNGs decoded by the REAL codec. Each profile column
    * is emitted only for the types where its value is a decode
    * contract rather than a codec artifact — total_bytes for text
    * (byte length is exact), pixel dims and frame count for images
    * (the oracle predicts them arithmetically), content distinctness
    * for both — so the whole profile is rows+schema+hash checkable.
    * (PNG byte size would depend on the encoder's compression choices:
    * deliberately not exposed. Audio/video remain the stub codec,
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
    val feats = Multimodal.decodeFeatures(text.union(images)).toDF()
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
        when(col("media_type") === "text/plain", col("sum_bytes"))
          .cast("long").as("total_bytes"),
        when(col("media_type") === "image/png", col("mnw"))
          .cast("long").as("min_w"),
        when(col("media_type") === "image/png", col("mxw"))
          .cast("long").as("max_w"),
        when(col("media_type") === "image/png", col("mnh"))
          .cast("long").as("min_h"),
        when(col("media_type") === "image/png", col("mxh"))
          .cast("long").as("max_h"),
        when(col("media_type") === "image/png", col("frames"))
          .cast("long").as("n_frames"),
        col("n_distinct_content"))
      .orderBy("media_type")
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_media_profile" -> (qMediaProfile _),
    "q_image_decode" -> (qImageDecode _)
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
         |  FROM generate_series(0, ${NImages - 1}) AS t(i))
         |SELECT * FROM img UNION ALL SELECT * FROM txt ORDER BY media_type""".stripMargin,
    "q_image_decode" ->
      s"""SELECT i AS media_id,
         |       CAST(16 + i % 32 AS BIGINT) AS width,
         |       CAST(8 + i % 16 AS BIGINT) AS height,
         |       CAST(greatest(1, (16 + i % 32) // 2) AS BIGINT) AS half_w,
         |       CAST(greatest(1, (8 + i % 16) // 2) AS BIGINT) AS half_h
         |FROM generate_series(0, ${NImages - 1}) AS t(i)
         |ORDER BY media_id""".stripMargin
  )
}
