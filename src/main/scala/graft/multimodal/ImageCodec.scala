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
