package graft.ml

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import javax.imageio.stream.MemoryCacheImageOutputStream

/** Real JDK video codec for the multimodal pipeline: MJPEG-in-AVI. The JDK
  * has no H.264 decoder, but AVI is RIFF (the same container family
  * [[AudioCodec]] already walks for WAV) and every MJPEG frame is a plain
  * JPEG `javax.imageio` decodes out of the box — so an end-to-end video
  * path (container parse → per-frame codec decode → frame statistics) runs
  * with zero external jars. This closes the last `stubDecodeFeatures`
  * seam: all three media families (PNG image, WAV audio, MJPEG-AVI video)
  * now decode for real.
  *
  * Exactness contract for the correctness gate: JPEG is lossy in general,
  * but a solid-GRAY frame (r = g = b) survives the round trip bit-exact at
  * compression quality 1.0 — constant luma is a pure-DC block the
  * quantizer preserves, and constant chroma is exactly 128 so 4:2:0
  * subsampling has nothing to lose. (Measured here: 256/256 gray levels
  * exact; arbitrary colors drift ±1, so the fixtures are gray.) That lets
  * a codec-free SQL oracle re-derive every decoded frame mean from the
  * integer generator formula.
  *
  * Like the other codecs this runs executor-side inside the decode
  * closure seam (the reference treats media as opaque bytes; zync has no
  * media path — this is the training-pipeline extension): payload bytes
  * never shuffle, only small per-frame stats rows flow downstream.
  */
object VideoCodec {

  ImageIO.setUseCache(false)

  /** Deterministic solid-gray frame `f` of asset `id`: every pixel of
    * every channel is `(id*31 + 7*f) mod 256`.
    */
  def syntheticFrame(id: Long, f: Int, w: Int, h: Int): BufferedImage = {
    val g = ((id * 31 + 7L * f) % 256).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    img
  }

  /** JPEG-encode one frame at quality 1.0 (the exactness contract above). */
  def encodeJpeg(img: BufferedImage): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(out)
    writer.write(null, new IIOImage(img, null, null), p)
    writer.dispose(); out.close()
    bos.toByteArray
  }

  // ---- RIFF/AVI writer ----------------------------------------------------

  private def fourcc(s: String): Array[Byte] = s.getBytes("ASCII")
  private def u32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def u16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc(id) ++ u32(body.length.toLong) ++ body ++ pad
  }
  private def list(kind: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(kind) ++ body)

  /** Encode frames (all the same size) as an MJPEG AVI byte payload. */
  def encodeAvi(frames: Seq[BufferedImage], fps: Int): Array[Byte] = {
    require(frames.nonEmpty, "AVI needs at least one frame")
    require(fps > 0, s"fps must be positive: $fps")
    val (w, h) = (frames.head.getWidth, frames.head.getHeight)
    require(frames.forall(f => f.getWidth == w && f.getHeight == h),
      "all frames must share dimensions")
    val jpegs = frames.map(encodeJpeg)
    val maxJpeg = jpegs.map(_.length).max

    val avih = chunk("avih", Array.concat(
      u32(1000000L / fps),          // dwMicroSecPerFrame
      u32(0), u32(0), u32(0),       // dwMaxBytesPerSec, padding, flags
      u32(frames.length.toLong),    // dwTotalFrames
      u32(0), u32(1),               // dwInitialFrames, dwStreams
      u32(maxJpeg.toLong),          // dwSuggestedBufferSize
      u32(w.toLong), u32(h.toLong),
      u32(0), u32(0), u32(0), u32(0)))

    val strh = chunk("strh", Array.concat(
      fourcc("vids"), fourcc("MJPG"),
      u32(0), u16(0), u16(0),       // dwFlags, wPriority, wLanguage
      u32(0),                       // dwInitialFrames
      u32(1), u32(fps.toLong),      // dwScale / dwRate = frame rate
      u32(0), u32(frames.length.toLong),
      u32(maxJpeg.toLong), u32(0xffffffffL), u32(0), // bufSize, quality, sampleSize
      u16(0), u16(0), u16(w), u16(h)))               // rcFrame

    val strf = chunk("strf", Array.concat(
      u32(40), u32(w.toLong), u32(h.toLong),
      u16(1), u16(24),              // biPlanes, biBitCount
      fourcc("MJPG"),               // biCompression
      u32(w.toLong * h * 3), u32(0), u32(0), u32(0), u32(0)))

    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ u32(body.length.toLong) ++ body
  }

  // ---- RIFF/AVI parser ----------------------------------------------------

  private def readU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def cc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "ASCII")

  /** Container-level metadata recovered from the AVI headers (not from the
    * generator): dimensions, frame rate, declared frame count.
    */
  final case class AviMeta(width: Int, height: Int, fps: Int, n_frames: Int)

  /** Walk the RIFF tree; returns header meta + the raw JPEG payload of
    * every '00dc' (compressed video) chunk in stream order.
    */
  def parseAvi(bytes: Array[Byte]): (AviMeta, Seq[Array[Byte]]) = {
    require(bytes != null && bytes.length > 12, "payload is not an AVI")
    require(cc(bytes, 0) == "RIFF" && cc(bytes, 8) == "AVI ",
      "payload is not an AVI (RIFF magic missing)")
    var meta: AviMeta = null
    var scaleRate: (Long, Long) = null
    val frames = Seq.newBuilder[Array[Byte]]

    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = cc(bytes, off)
        val sz = readU32(bytes, off + 4).toInt
        val body = off + 8
        require(sz >= 0 && body + sz <= bytes.length,
          s"truncated AVI: chunk $id declares $sz bytes past end of payload")
        id match {
          case "LIST" =>
            walk(body + 4, body + sz) // skip the list-kind fourcc
          case "avih" =>
            meta = AviMeta(
              width = readU32(bytes, body + 32).toInt,
              height = readU32(bytes, body + 36).toInt,
              fps = 0, // filled from strh dwScale/dwRate below
              n_frames = readU32(bytes, body + 16).toInt)
          case "strh" if cc(bytes, body) == "vids" =>
            require(cc(bytes, body + 4) == "MJPG",
              s"unsupported video handler ${cc(bytes, body + 4)} (only MJPG decodes here)")
            scaleRate = (readU32(bytes, body + 20), readU32(bytes, body + 24))
          case "00dc" =>
            frames += java.util.Arrays.copyOfRange(bytes, body, body + sz)
          case _ => () // strf, idx1, junk: not needed
        }
        off = body + sz + (sz & 1) // chunks pad to even
      }
    }
    walk(12, bytes.length)
    require(meta != null, "AVI has no avih header")
    require(scaleRate != null, "AVI has no MJPG vids stream header")
    val out = meta.copy(fps = (scaleRate._2 / math.max(scaleRate._1, 1L)).toInt)
    val fs = frames.result()
    require(fs.length == out.n_frames,
      s"header declares ${out.n_frames} frames, movi carries ${fs.length}")
    (out, fs)
  }

  /** Stats row of one decoded frame: dimensions from the decoded JPEG (not
    * the container header) and per-channel means over the decoded raster —
    * integral for the solid-gray fixtures, hence `mean_gray` as Long.
    */
  final case class VideoFrameStats(frame_idx: Int, f_w: Int, f_h: Int,
      mean_gray: Long)

  /** Full decode: container parse, per-frame ImageIO JPEG decode, per-frame
    * stats. The gray mean is asserted integral and channel-uniform — any
    * quantization drift, channel swap, or chroma bleed fails loudly here
    * rather than producing silently-wrong features.
    */
  def decodeFrameStats(bytes: Array[Byte]): (AviMeta, Seq[VideoFrameStats]) = {
    val (meta, jpegs) = parseAvi(bytes)
    val stats = jpegs.zipWithIndex.map { case (j, i) =>
      val img = ImageIO.read(new ByteArrayInputStream(j))
      require(img != null, s"frame $i is not a decodable JPEG")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      require(sr == sg && sg == sb && sr % n == 0,
        s"frame $i decoded non-uniform/non-gray (exactness contract broken)")
      VideoFrameStats(i, w, h, sr / n)
    }
    (meta, stats)
  }
}
