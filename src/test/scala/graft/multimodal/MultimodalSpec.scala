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

  test("average hash: identical pixels collide, resize moves few bits") {
    def hashOf(bytes: Array[Byte]): Long =
      ImageCodec.averageHash(ImageCodec.decodeImage(bytes).get)
    // byte-identical encodes → identical hash (determinism)
    val a = hashOf(ImageCodec.encodePng(32, 24, seed = 3L))
    val b = hashOf(ImageCodec.encodePng(32, 24, seed = 3L))
    assert(a == b)
    // scale robustness on SMOOTH content (the property aHash is for;
    // the synthetic fixture gradient wraps mod 2^24 — high-frequency
    // noise — so it is deliberately not used here): the same smooth
    // function rendered at two resolutions must hash nearly equal,
    // because 8x8 block means approximate the same integral
    def smooth(w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (255.0 * (math.sin(3.0 * x / w) + math.cos(2.0 * y / h) + 2) / 4).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val big = ImageCodec.averageHash(smooth(64, 48))
    val small = ImageCodec.averageHash(smooth(32, 24))
    val d = ImageCodec.hammingDistance(big, small)
    assert(d <= 8, s"rescale moved $d/64 bits")
    assert(big != 0L && big != -1L, "degenerate hash")
  }

  test("image phash clusters exactly the byte-identical pairs") {
    val rows =
      graft.operators.MultimodalQueries.qImagePhash(spark, dir).collect()
    assert(rows.length == 24)
    rows.foreach { r =>
      val (canon, maxId, n) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(maxId == canon + 24 && n == 2, s"cluster $canon")
    }
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

  test("feature profile covers all three corpus types with per-type contract columns") {
    val profile = graft.operators.MultimodalQueries.qMediaProfile(spark, dir).collect()
    assert(profile.length == 3) // audio/wav + image/png (synthetic) + text/plain
    val byType = profile.map(r => r.getAs[String]("media_type") -> r).toMap
    val txt = byType("text/plain")
    assert(txt.getAs[Long]("n_items") == 500L)
    assert(txt.getAs[Long]("n_distinct_content") == 500L)
    assert(txt.isNullAt(txt.fieldIndex("min_w"))) // dims are image/audio-only
    val img = byType("image/png")
    assert(img.getAs[Long]("n_items") == 64L)
    assert(img.getAs[Long]("min_w") == 16L && img.getAs[Long]("max_w") == 47L)
    assert(img.isNullAt(img.fieldIndex("total_bytes"))) // codec-dependent
    val aud = byType("audio/wav")
    assert(aud.getAs[Long]("n_items") == 48L)
    assert(aud.getAs[Long]("min_w") == 8000L && aud.getAs[Long]("max_w") == 11000L)
    assert(aud.getAs[Long]("min_h") == 1L && aud.getAs[Long]("max_h") == 2L)
    // WAV byte size IS a contract: 44-byte header + frames*ch*2
    val expectedBytes = (0 until 48).map(i => 44L + (64 + 8 * i).toLong * (1 + i % 2) * 2).sum
    assert(aud.getAs[Long]("total_bytes") == expectedBytes)
  }

  test("WAV codec round-trips header facts and sample statistics") {
    val samples = Array.tabulate(200)(k => ((k * 7) % 300 - 150).toShort)
    val wav = WavCodec.encodePcm16(16000, 2, samples)
    assert(wav.length == 44 + 400)
    val info = WavCodec.decode(wav).get
    assert(info.sampleRate == 16000 && info.channels == 2 && info.bitsPerSample == 16)
    assert(info.nFrames == 100) // 200 interleaved samples / 2 channels
    assert(info.sumAbs == samples.map(s => math.abs(s.toLong)).sum)
  }

  test("WAV codec skips unknown chunks and rejects malformed input") {
    val wav = WavCodec.encodePcm16(8000, 1, Array[Short](1, -2, 3))
    // splice a LIST chunk between fmt and data: still decodable
    val listChunk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = wav.slice(0, 36) ++ listChunk ++ wav.slice(36, wav.length)
    // fix the RIFF size field (bytes 4-7, little-endian)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    assert(WavCodec.decode(spliced).exists(i => i.nFrames == 3 && i.sumAbs == 6L))
    // malformed inputs: truncated, bad magic, size overflow
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
    assert(WavCodec.decode("RIFFxxxxJUNK".getBytes("US-ASCII")).isEmpty)
    val overflow = wav.clone()
    java.nio.ByteBuffer.wrap(overflow).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue) // data size far past the buffer
    assert(WavCodec.decode(overflow).isEmpty)
  }

  test("audio dispatch uses the real codec; non-WAV audio falls back to stub") {
    val wav = WavCodec.encodePcm16(11000, 1, Array.tabulate(80)(k => k.toShort))
    val item = Multimodal.MediaItem(5L, "audio/wav", "s", wav.length.toLong, wav)
    val f = Multimodal.Codec.decode(item)
    assert(f.width == 11000 && f.height == 1 && f.n_frames == 80)
    val junk = Multimodal.MediaItem(6L, "audio/mpeg", "s", 32L, Array.fill(32)(0x11.toByte))
    val g = Multimodal.Codec.decode(junk) // must not throw: stub fallback
    assert(g.n_bytes == 32L && g.n_frames >= 1)
  }

  test("distributed audio pipeline decodes real PCM statistics end-to-end") {
    val rows = graft.operators.MultimodalQueries.qAudioDecode(spark, dir).collect()
    assert(rows.length == 48)
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      val frames = 64 + 8 * i
      val ch = 1 + i % 2
      assert(r.getLong(1) == 8000 + 1000 * (i % 4), s"rate of $i")
      assert(r.getLong(2) == ch, s"channels of $i")
      assert(r.getLong(3) == frames, s"frames of $i")
      val expSum = (0 until frames * ch).map(k => math.abs(((k * 37 + i * 11) % 997) - 498).toLong).sum
      assert(r.getLong(4) == expSum, s"sum_abs of $i")
      assert(r.getLong(5) == expSum / (frames * ch), s"mean_abs of $i")
    }
  }

  test("binaryFile ingestion: glob prunes the decoy at listing, bytes round-trip") {
    val blobDir = java.nio.file.Files.createTempDirectory("graft_bi_spec").toString
    try {
      val png = graft.multimodal.ImageCodec.encodePng(20, 10, 7L)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(blobDir, "img-0007.png"), png)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(blobDir, "README.txt"), "decoy".getBytes("UTF-8"))
      val blobs = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png").load(blobDir)
      // the source's fixed schema: path, modificationTime, length, content
      assert(blobs.columns.toSet ==
        Set("path", "modificationTime", "length", "content"))
      val rows = blobs.collect()
      assert(rows.length == 1, "glob must exclude the decoy file")
      val r = rows(0)
      assert(r.getAs[String]("path").endsWith("img-0007.png"))
      assert(r.getAs[Long]("length") == png.length.toLong)
      assert(r.getAs[Array[Byte]]("content").toSeq == png.toSeq,
        "content must be the exact written bytes")
    } finally graft.Fs.deleteRecursively(blobDir)
  }

  test("q_binary_ingest decodes real dims from path-addressed blobs") {
    val rows = graft.operators.MultimodalQueries.qBinaryIngest(spark, dir).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val i = r.getLong(0)
      assert(r.getLong(1) == 16 + i % 32, s"width of $i")
      assert(r.getLong(2) == 8 + i % 16, s"height of $i")
    }
  }
}
