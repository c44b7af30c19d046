package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine

/** Multimodal column handling: media as opaque `binary` + typed metadata,
  * with decode / feature-extract / frame-sample stages shaped for a real
  * cluster run — schema, partitioning and per-partition batch iteration
  * are real. Image payloads decode through the REAL image codec
  * ([[ImageCodec]], JDK `javax.imageio` — PNG/JPEG/GIF/BMP); audio
  * payloads decode through the REAL PCM/WAV codec ([[WavCodec]],
  * pure-JVM RIFF parse + sample decode); only compressed audio and
  * video remain stubbed ([[StubCodec]]; no codec libraries for those
  * in this container).
  *
  * Scale shape: media bytes never pass through a shuffle — decode and
  * feature extraction are narrow mapPartitions stages; only the small
  * extracted-feature rows (ids + fixed-width features) flow into joins
  * and aggregations downstream.
  */
object Multimodal {

  /** One media object: opaque payload + the metadata a lakehouse would
    * carry alongside it (content type, source, declared size).
    */
  case class MediaItem(
      media_id: Long,
      media_type: String,
      source: String,
      declared_bytes: Long,
      content: Array[Byte])

  /** Decoded features: fixed-width, shuffle-friendly. */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: String)

  /** Stable content checksum shared by both codec paths. */
  private def checksum(bytes: Array[Byte]): String =
    java.lang.Long.toHexString(
      bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b))

  /** Codec dispatch: image payloads go through the real
    * [[ImageCodec]], audio payloads through the real [[WavCodec]]
    * (feature mapping: width = sample rate, height = channels,
    * n_frames = per-channel samples — fixed-width facts a downstream
    * aggregation can contract on); anything else (and undecodable
    * payload bytes) falls back to the deterministic [[StubCodec]].
    */
  object Codec {
    def decode(item: MediaItem): MediaFeatures =
      if (item.media_type.startsWith("image/"))
        ImageCodec.decodeDims(item.content) match {
          case Some((w, h)) =>
            MediaFeatures(item.media_id, item.media_type,
              item.content.length.toLong, w, h, n_frames = 1,
              checksum = checksum(item.content))
          case None => StubCodec.decode(item)
        }
      else if (item.media_type.startsWith("audio/"))
        WavCodec.decode(item.content) match {
          case Some(w) =>
            MediaFeatures(item.media_id, item.media_type,
              item.content.length.toLong,
              width = w.sampleRate, height = w.channels,
              n_frames = w.nFrames, checksum = checksum(item.content))
          case None => StubCodec.decode(item)
        }
      else StubCodec.decode(item)

    /** Image: pixel-space resize to (w, h); non-image: byte-stride
      * stub resize to w*h bytes (keeps the declared-length contract).
      */
    def resize(item: MediaItem, width: Int, height: Int): MediaItem =
      if (item.media_type.startsWith("image/"))
        ImageCodec.resizePng(item.content, width, height) match {
          case Some(out) => item.copy(content = out, declared_bytes = out.length.toLong)
          case None => StubCodec.resize(item, width * height)
        }
      else StubCodec.resize(item, width * height)
  }

  /** STUB CODEC — deterministic fake for media types without a decoder
    * in this environment (audio/video). A production build swaps it
    * for e.g. ffmpeg bindings; everything around it (typed Dataset,
    * mapPartitions batch shape, partitioning) is the real pipeline.
    */
  object StubCodec {
    /** Fake "decode": derives dimensions/frames from the bytes, so the
      * output is stable, content-sensitive, and test-assertable.
      */
    def decode(item: MediaItem): MediaFeatures = {
      val bytes = item.content
      val n = bytes.length.toLong
      // content-derived pseudo-dimensions (NOT a real decode)
      val h = java.util.Arrays.hashCode(bytes)
      MediaFeatures(
        media_id = item.media_id,
        media_type = item.media_type,
        n_bytes = n,
        width = 16 + math.floorMod(h, 64),
        height = 16 + math.floorMod(h >> 8, 64),
        n_frames = 1 + math.floorMod(h >> 16, 30),
        checksum = Multimodal.checksum(bytes))
    }

    /** Fake "frame sample": every k-th byte window stands in for frames. */
    def sampleFrames(item: MediaItem, every: Int): Seq[Array[Byte]] =
      item.content.grouped(math.max(1, every)).toSeq

    /** Fake "resize": deterministic byte down/up-sampling to `targetLen`
      * (stride sampling — stands in for pixel-space interpolation).
      */
    def resize(item: MediaItem, targetLen: Int): MediaItem = {
      val src = item.content
      val out =
        if (src.isEmpty || targetLen <= 0) Array.emptyByteArray
        else Array.tabulate(targetLen)(i => src((i.toLong * src.length / targetLen).toInt))
      item.copy(content = out, declared_bytes = out.length.toLong)
    }
  }

  /** Fixture adapter: the `documents` table posed as a media corpus
    * (text payload as the opaque binary). Real deployments point this
    * at an object-store manifest instead.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Engine.table(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("media_type"),
        col("source"),
        col("n_chars").as("declared_bytes"),
        col("text").cast("binary").as("content"))
      .as[MediaItem]
  }

  /** Decode stage: narrow, per-partition, no shuffle of media bytes.
    * Dispatches through [[Codec]] — real `javax.imageio` for images.
    */
  def decodeFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(Codec.decode))
  }

  /** Resize stage: same narrow per-partition shape as decode. */
  def resizeAll(items: Dataset[MediaItem], targetLen: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(StubCodec.resize(_, targetLen)))
  }

  /** Pixel-space resize stage for image media (real codec). */
  def resizeImages(items: Dataset[MediaItem], width: Int, height: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(Codec.resize(_, width, height)))
  }
}
