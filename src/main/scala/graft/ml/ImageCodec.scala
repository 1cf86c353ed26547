package graft.ml

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real JDK image codec for the multimodal pipeline: PNG encode/decode via
  * `javax.imageio` (ships with the JDK — no external jars) plus exact
  * nearest-neighbor resize and horizontal-band ("frame") statistics over
  * the DECODED pixel raster.
  *
  * The synthetic test images are deterministic: each channel of pixel
  * (x, y) of asset `id` is a linear function of (id, x, y) mod 256. That
  * makes every pixel statistic this codec produces re-derivable by a
  * codec-free SQL oracle — so the correctness gate verifies an actual
  * PNG encode → decode round trip against independently computed ground
  * truth, not a stub against itself.
  *
  * Everything here runs executor-side inside the decode closure seam
  * (ref: the reference treats media as opaque bytes; zync has no media
  * path — this is the training-pipeline extension): payload bytes never
  * shuffle, only small stats rows flow downstream.
  */
object ImageCodec {

  // ImageIO's default file-backed stream cache would hit executor /tmp on
  // every decode; these are small in-memory images.
  ImageIO.setUseCache(false)

  /** Deterministic synthetic RGB image for asset `id`. */
  def syntheticImage(id: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + 7L * x + 13L * y) % 256).toInt
        val g = ((id * 17 + 5L * x + 11L * y) % 256).toInt
        val b = ((id * 29 + 3L * x + 19L * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(img, "png", bos))
      throw new IllegalStateException("no PNG writer available in this JDK")
    bos.toByteArray
  }

  /** Real ImageIO decode; null for bytes no installed reader understands
    * (the caller decides whether that's an error or a skip).
    */
  def decode(bytes: Array[Byte]): BufferedImage =
    if (bytes == null || bytes.isEmpty) null
    else ImageIO.read(new ByteArrayInputStream(bytes))

  /** Exact nearest-neighbor resize over the decoded raster:
    * out(x, y) = in(x * srcW / dstW, y * srcH / dstH) with integer floor —
    * deterministic and SQL-mirrorable, unlike Graphics2D interpolation
    * whose sampling points are implementation-defined.
    */
  def resizeNearest(img: BufferedImage, dw: Int, dh: Int): BufferedImage = {
    require(dw > 0 && dh > 0, s"resize target must be positive: ${dw}x$dh")
    val out = new BufferedImage(dw, dh, BufferedImage.TYPE_INT_RGB)
    val (sw, sh) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < dh) {
      var x = 0
      while (x < dw) {
        out.setRGB(x, y, img.getRGB(x * sw / dw, y * sh / dh) & 0xffffff)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-channel pixel means over rows [y0, y1) (integer-exact sums, so the
    * double division is bit-reproducible anywhere).
    */
  def channelMeans(img: BufferedImage, y0: Int, y1: Int): (Double, Double, Double) = {
    val w = img.getWidth
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = y0
    while (y < y1) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff
        sg += (p >> 8) & 0xff
        sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w * (y1 - y0)).toDouble
    (sr / n, sg / n, sb / n)
  }

  /** Stats row of one decoded image: true dimensions recovered from the PNG
    * plus full-image and 4x4-nearest-resized channel means.
    */
  final case class ImgStats(width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, rs_mean_r: Double)

  def decodeStats(bytes: Array[Byte]): ImgStats = {
    val img = decode(bytes)
    require(img != null, "payload is not a decodable image")
    val (mr, mg, mb) = channelMeans(img, 0, img.getHeight)
    val (rr, _, _) = {
      val small = resizeNearest(img, 4, 4)
      channelMeans(small, 0, small.getHeight)
    }
    ImgStats(img.getWidth, img.getHeight, mr, mg, mb, rr)
  }

  /** One decoded "frame" = one of `n` contiguous horizontal bands (the
    * still-image analogue of frame sampling; true video decode needs a
    * codec ImageIO lacks — that format keeps the documented stub seam).
    */
  final case class FrameStats(frame_idx: Int, f_h: Int, mean_r: Double)

  def frameStats(bytes: Array[Byte], n: Int): Seq[FrameStats] = {
    val img = decode(bytes)
    require(img != null, "payload is not a decodable image")
    val h = img.getHeight
    (0 until n).map { i =>
      val (y0, y1) = (i * h / n, (i + 1) * h / n)
      // images shorter than n rows yield some empty bands — report them as
      // zero-height with a 0 mean rather than NaN
      val (mr, _, _) = if (y1 > y0) channelMeans(img, y0, y1) else (0.0, 0.0, 0.0)
      FrameStats(i, y1 - y0, mr)
    }
  }
}
