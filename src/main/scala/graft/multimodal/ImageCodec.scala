package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real image codec on the JDK's built-in `javax.imageio` — no external
  * libraries, so it works in a zero-egress build. PNG encode/decode and
  * pixel-space resize; executors call these from narrow mapPartitions
  * stages (see [[Multimodal]]), so image bytes never cross a shuffle.
  */
object ImageCodec {

  /** Deterministic synthetic PNG: a WxH RGB image whose pixels derive
    * from (seed, x, y). Used to build image fixtures in-process; the
    * bytes round-trip through the real PNG encoder.
    */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (seed * 31 + x * 7 + y * 131) & 0xffffff
        img.setRGB(x, y, v.toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode any ImageIO-supported format (PNG/JPEG/GIF/BMP);
    * None when the payload isn't a decodable image.
    */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Real (width, height) of an encoded image, if decodable. */
  def decodeDims(bytes: Array[Byte]): Option[(Int, Int)] =
    decodeImage(bytes).map(img => (img.getWidth, img.getHeight))

  /** 64-bit average perceptual hash (aHash): the image is divided into
    * an 8x8 block grid, each block's summed gray value is compared to
    * the whole-image mean, and bit (by*8+bx) is set when the block is
    * strictly brighter. All-integer arithmetic — the comparison is
    * cross-multiplied (blockSum * totalPixels > totalSum * blockPixels)
    * so no division ever rounds — which makes the hash a pure function
    * of the decoded pixels: byte-identical images ALWAYS collide, and
    * mild global transforms (resize, brightness shift) move few bits.
    * Images narrower/shorter than 8px reuse pixels across blocks
    * (block edges still cover the full image) so the hash is total.
    */
  def averageHash(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val blockSum = new Array[Long](64)
    val blockN = new Array[Long](64)
    var totalSum = 0L
    var by = 0
    while (by < 8) {
      val y0 = by * h / 8
      val y1 = math.max(y0 + 1, (by + 1) * h / 8)
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8
        val x1 = math.max(x0 + 1, (bx + 1) * w / 8)
        var s = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val b = by * 8 + bx
        blockSum(b) = s
        blockN(b) = (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0)
        totalSum += s
        bx += 1
      }
      by += 1
    }
    val totalN = blockN.sum
    var bits = 0L
    var b = 0
    while (b < 64) {
      // 128-bit compare: blockSum*totalN vs totalSum*blockN would
      // overflow Long around a gigapixel (sums reach ~765*N, N = total
      // pixels), silently flipping bits on exactly the large imagery
      // this is pitched at
      if (cmpProd(blockSum(b), totalN, totalSum, blockN(b)) > 0)
        bits |= 1L << b
      b += 1
    }
    bits
  }

  /** Compare a*b vs c*d exactly for non-negative longs (sign of
    * a*b - c*d) via 128-bit products — no overflow at any input.
    */
  private def cmpProd(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(lo1, lo2)
  }

  /** Hamming distance between two [[averageHash]] values. */
  def hammingDistance(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  /** Pixel-space resize: decode, scale-draw onto a target-size canvas,
    * re-encode as PNG. None when the input isn't a decodable image.
    */
  def resizePng(bytes: Array[Byte], width: Int, height: Int): Option[Array[Byte]] =
    decodeImage(bytes).map { src =>
      val dst = new BufferedImage(
        math.max(1, width), math.max(1, height), BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try g.drawImage(src, 0, 0, dst.getWidth, dst.getHeight, null)
      finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }
}
