package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.multimodal.Multimodal

/** Query surface for the multimodal module. The SQL-expressible metadata
  * path is oracle-checked; the stubbed-codec feature path is covered by
  * MultimodalSpec (not SQL-expressible — fake decode).
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

  /** Feature profile through the full typed pipeline (stub decode). */
  def qMediaProfile(spark: SparkSession, dir: String): DataFrame =
    Multimodal.featureProfile(
      Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(spark, dir)))
      .orderBy("media_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_media_profile" -> (qMediaProfile _)
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'text/plain' AS media_type, source,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       sha256(text) AS sha256_hex,
        |       to_base64(CAST(substr(text, 1, 8) AS BLOB)) AS head8_b64
        |FROM documents ORDER BY media_id""".stripMargin
    // q_media_profile: stub-codec output, rows-only check by design
  )
}
