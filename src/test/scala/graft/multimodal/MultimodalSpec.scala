package graft.multimodal

import graft.SparkSpec

/** The stub-codec pipeline: typed Dataset plumbing, per-partition decode,
  * determinism of the fake codec, and the downstream profile aggregation.
  */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("media adapter produces one item per document with payload bytes") {
    val items = Multimodal.mediaFromDocuments(spark, dir).collect()
    assert(items.nonEmpty)
    assert(items.forall(i => i.content.nonEmpty && i.media_type == "text/plain"))
    assert(items.map(_.media_id).distinct.length == items.length)
  }

  test("decode stage is deterministic and preserves cardinality") {
    val items = Multimodal.mediaFromDocuments(spark, dir)
    val f1 = Multimodal.decodeFeatures(items).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(items).collect().sortBy(_.media_id)
    assert(f1.length == items.count())
    assert(f1.map(f => (f.media_id, f.checksum, f.width, f.height)).toSeq ==
      f2.map(f => (f.media_id, f.checksum, f.width, f.height)).toSeq)
    assert(f1.forall(f => f.width >= 16 && f.height >= 16 && f.n_frames >= 1))
  }

  test("distinct payloads get distinct checksums (content sensitivity)") {
    val feats = Multimodal.decodeFeatures(
      Multimodal.mediaFromDocuments(spark, dir)).collect()
    // fixture has no duplicate texts, so checksums must all differ
    assert(feats.map(_.checksum).distinct.length == feats.length)
  }

  test("stub resize produces exactly targetLen bytes, deterministically") {
    val items = Multimodal.mediaFromDocuments(spark, dir)
    val resized = Multimodal.resizeAll(items, 64).collect()
    assert(resized.forall(i => i.content.length == 64 && i.declared_bytes == 64L))
    val again = Multimodal.resizeAll(items, 64).collect()
    assert(resized.map(_.content.toSeq).toSeq == again.map(_.content.toSeq).toSeq)
  }

  test("real PNG codec round-trips true dimensions through decode") {
    val png = ImageCodec.encodePng(37, 21, seed = 5L)
    assert(ImageCodec.decodeDims(png).contains((37, 21)))
    val item = Multimodal.MediaItem(9L, "image/png", "s", png.length.toLong, png)
    val f = Multimodal.Codec.decode(item)
    assert(f.width == 37 && f.height == 21 && f.n_frames == 1)
    assert(f.n_bytes == png.length.toLong)
  }

  test("real pixel-space resize changes decoded dimensions to the target") {
    val png = ImageCodec.encodePng(40, 24, seed = 11L)
    val item = Multimodal.MediaItem(3L, "image/png", "s", png.length.toLong, png)
    val small = Multimodal.Codec.resize(item, 20, 12)
    assert(ImageCodec.decodeDims(small.content).contains((20, 12)))
  }

  test("undecodable image bytes fall back to the stub codec") {
    val junk = Array.fill(32)(0x42.toByte)
    val item = Multimodal.MediaItem(7L, "image/png", "s", 32L, junk)
    val f = Multimodal.Codec.decode(item) // must not throw
    assert(f.n_bytes == 32L && f.n_frames >= 1)
  }

  test("distributed image pipeline decodes real dimensions end-to-end") {
    val rows = graft.operators.MultimodalQueries.qImageDecode(spark, dir).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val i = r.getLong(0)
      assert(r.getLong(1) == 16 + i % 32, s"width of $i")
      assert(r.getLong(2) == 8 + i % 16, s"height of $i")
      assert(r.getLong(3) == math.max(1, (16 + i % 32) / 2), s"half_w of $i")
      assert(r.getLong(4) == math.max(1, (8 + i % 16) / 2), s"half_h of $i")
    }
  }

  test("stub frame sampling yields ceil(n/k) frames") {
    val item = Multimodal.MediaItem(1L, "video/fake", "s", 10L, Array.fill(100)(7.toByte))
    assert(Multimodal.StubCodec.sampleFrames(item, 30).length == 4)
    assert(Multimodal.StubCodec.sampleFrames(item, 1).length == 100)
  }

  test("feature profile covers both corpus types with per-type contract columns") {
    val profile = graft.operators.MultimodalQueries.qMediaProfile(spark, dir).collect()
    assert(profile.length == 2) // image/png (synthetic) + text/plain (fixture)
    val byType = profile.map(r => r.getAs[String]("media_type") -> r).toMap
    val txt = byType("text/plain")
    assert(txt.getAs[Long]("n_items") == 500L)
    assert(txt.getAs[Long]("n_distinct_content") == 500L)
    assert(txt.isNullAt(txt.fieldIndex("min_w"))) // pixel dims are image-only
    val img = byType("image/png")
    assert(img.getAs[Long]("n_items") == 64L)
    assert(img.getAs[Long]("min_w") == 16L && img.getAs[Long]("max_w") == 47L)
    assert(img.isNullAt(img.fieldIndex("total_bytes"))) // codec-dependent
  }
}
