package graft.ml

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  val dir = "/root/testdata/sf0.001"

  test("real resize: payload round trip is pixel-exact nearest-neighbor") {
    val src = ImageCodec.syntheticImage(42L, 11, 9)
    val resized = MultimodalOps.resizeImage(ImageCodec.encodePng(src), 6, 5)
    val img = ImageCodec.decode(resized)
    assert(img.getWidth == 6 && img.getHeight == 5)
    // every output pixel equals the floor-sampled source pixel
    for (y <- 0 until 5; x <- 0 until 6)
      assert((img.getRGB(x, y) & 0xffffff) ==
        (src.getRGB(x * 11 / 6, y * 9 / 5) & 0xffffff),
        s"pixel ($x,$y) diverged from nearest-neighbor sample")
    // null and non-image payloads degrade to null, not an exception
    assert(MultimodalOps.resizeImage(null, 4, 4) == null)
    assert(MultimodalOps.resizeImage("not a png".getBytes, 4, 4) == null)
  }

  test("frames partition the payload exactly (no byte lost or duplicated)") {
    val frames = MultimodalOps.sampleFrames(
      MultimodalOps.assets(spark, dir), 4)
    // per asset: 4 frames whose sizes sum to the payload size
    val bad = frames.groupBy("asset_id")
      .agg(count(lit(1)).as("n"), sum("f_bytes").as("total"))
      .join(MultimodalOps.assets(spark, dir)
        .select(col("asset_id"), col("meta.n_bytes")), Seq("asset_id"))
      .filter(col("n") =!= 4 || col("total") =!= col("n_bytes"))
    assert(bad.isEmpty, bad.take(3).mkString(","))
    // frames re-concatenate to the original payload (order restored
    // inside the aggregate — collect_list has no ordering guarantee)
    val rejoined = frames
      .groupBy("asset_id")
      .agg(md5(concat_ws("", transform(
        array_sort(collect_list(struct(col("frame_idx"), col("frame").cast("string").as("s")))),
        x => x.getField("s")))).as("fp"))
    val orig = MultimodalOps.assets(spark, dir)
      .select(col("asset_id"), md5(col("payload").cast("string")).as("fp0"))
    assert(rejoined.join(orig, Seq("asset_id"))
      .filter(col("fp") =!= col("fp0")).isEmpty)
  }

  test("PNG round trip: ImageIO decode recovers every pixel exactly") {
    val img = ImageCodec.syntheticImage(42L, 11, 9)
    val bytes = ImageCodec.encodePng(img)
    // a real PNG: magic header present, and it is NOT the raw raster
    assert(bytes.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val back = ImageCodec.decode(bytes)
    assert(back.getWidth == 11 && back.getHeight == 9)
    for (y <- 0 until 9; x <- 0 until 11)
      assert((back.getRGB(x, y) & 0xffffff) == (img.getRGB(x, y) & 0xffffff),
        s"pixel ($x,$y)")
  }

  test("nearest-neighbor resize samples exactly floor(x*sw/dw, y*sh/dh)") {
    val img = ImageCodec.syntheticImage(7L, 16, 12)
    val small = ImageCodec.resizeNearest(img, 4, 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((small.getRGB(x, y) & 0xffffff) ==
        (img.getRGB(x * 16 / 4, y * 12 / 4) & 0xffffff))
  }

  test("decodeStats matches the generator formula (independent ground truth)") {
    val (id, w, h) = (123L, 13, 10)
    val st = ImageCodec.decodeStats(ImageCodec.encodePng(ImageCodec.syntheticImage(id, w, h)))
    assert(st.width == w && st.height == h)
    val px = for (y <- 0 until h; x <- 0 until w) yield (x, y)
    def mean(f: (Int, Int) => Long) = px.map(f.tupled).sum.toDouble / (w * h)
    assert(st.mean_r == mean((x, y) => (id * 31 + 7L * x + 13L * y) % 256))
    assert(st.mean_g == mean((x, y) => (id * 17 + 5L * x + 11L * y) % 256))
    assert(st.mean_b == mean((x, y) => (id * 29 + 3L * x + 19L * y) % 256))
    val rp = for (y <- 0 until 4; x <- 0 until 4) yield (x * w / 4, y * h / 4)
    assert(st.rs_mean_r ==
      rp.map { case (x, y) => (id * 31 + 7L * x + 13L * y) % 256 }.sum.toDouble / 16)
  }

  test("frame bands partition the decoded image height exactly") {
    val fs = ImageCodec.frameStats(
      ImageCodec.encodePng(ImageCodec.syntheticImage(5L, 9, 14)), 4)
    assert(fs.map(_.frame_idx) == Seq(0, 1, 2, 3))
    assert(fs.map(_.f_h).sum == 14)
    // band means are over disjoint row ranges: mean of band means weighted
    // by height equals the full-image mean
    val full = ImageCodec.decodeStats(
      ImageCodec.encodePng(ImageCodec.syntheticImage(5L, 9, 14)))
    val weighted = fs.map(f => f.mean_r * f.f_h).sum / 14
    assert(math.abs(weighted - full.mean_r) < 1e-9)
  }

  test("WAV round trip: javax.sound.sampled decode recovers every sample exactly") {
    val samples = AudioCodec.syntheticWave(42L, 236)
    val wav = AudioCodec.encodeWav(samples, 8000)
    // RIFF magic on the wire — a real container, not raw PCM
    assert(new String(wav.take(4), "ASCII") == "RIFF")
    val st = AudioCodec.decodeStats(wav)
    assert(st.sample_rate == 8000 && st.channels == 1 && st.n_samples == 236L)
    // ground truth from the formula, independent of the codec path
    val ints = (0 until 236).map(t => ((42L * 31 + 7L * t) % 4096 - 2048).toInt)
    assert(st.mean == ints.sum.toDouble / 236)
    assert(st.peak == ints.map(math.abs).max)
    assert(st.rms == math.sqrt(ints.map(s => s.toLong * s).sum.toDouble / 236))
  }

  test("audio assets decode distributively; stats columns match the formula") {
    val df = MultimodalOps.decodeAudioStats(MultimodalOps.audioAssets(spark, dir))
      .select(col("asset_id"), col("s.n_samples").as("n"), col("s.mean").as("m"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, n) = (r.getLong(0), r.getLong(1))
      assert(n == 200 + id % 37)
      val expect = (0 until n.toInt)
        .map(t => (id * 31 + 7L * t) % 4096 - 2048).sum.toDouble / n
      assert(r.getDouble(2) == expect, s"asset $id mean")
    }
  }

  test("AVI round trip: RIFF walk + per-frame JPEG decode recover headers and gray means") {
    val (id, nf, w, h, fps) = (42L, 5, 24, 16, 12)
    val avi = VideoCodec.encodeAvi(
      (0 until nf).map(f => VideoCodec.syntheticFrame(id, f, w, h)), fps)
    // real RIFF/AVI container on the wire
    assert(new String(avi.take(4), "ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "ASCII") == "AVI ")
    val (meta, frames) = VideoCodec.decodeFrameStats(avi)
    assert(meta.width == w && meta.height == h)
    assert(meta.fps == fps && meta.n_frames == nf)
    assert(frames.map(_.frame_idx) == (0 until nf))
    frames.foreach { f =>
      assert(f.f_w == w && f.f_h == h)
      // ground truth from the formula — the JPEG round trip must be exact
      assert(f.mean_gray == (id * 31 + 7L * f.frame_idx) % 256,
        s"frame ${f.frame_idx}")
    }
  }

  test("solid-gray JPEG round trip is bit-exact for every gray level") {
    (0 until 256).foreach { g =>
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, rgb)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(VideoCodec.encodeJpeg(img)))
      for (y <- 0 until 16; x <- 0 until 16)
        assert((back.getRGB(x, y) & 0xffffff) == rgb, s"gray $g pixel ($x,$y)")
    }
  }

  test("AVI parser rejects corrupt containers loudly") {
    intercept[IllegalArgumentException] {
      VideoCodec.parseAvi("definitely not an avi".getBytes)
    }
    // header/movi frame-count mismatch: truncate the last 00dc chunk away
    val avi = VideoCodec.encodeAvi(
      (0 until 3).map(f => VideoCodec.syntheticFrame(1L, f, 16, 16)), 10)
    intercept[IllegalArgumentException] {
      // chop the container mid-movi: the walk sees fewer frames than avih declares
      VideoCodec.parseAvi(avi.take(avi.length - 50))
    }
  }

  test("decodeMediaFeatures dispatches every media family to a real codec") {
    val png = ImageCodec.encodePng(ImageCodec.syntheticImage(3L, 8, 8))
    assert(MultimodalOps.decodeMediaFeatures("image/png", png)(0) == 8.0)
    val wav = AudioCodec.encodeWav(AudioCodec.syntheticWave(3L, 100), 8000)
    assert(MultimodalOps.decodeMediaFeatures("audio/wav", wav)(0) == 8000.0)
    val avi = VideoCodec.encodeAvi(
      (0 until 2).map(f => VideoCodec.syntheticFrame(3L, f, 16, 16)), 10)
    assert(MultimodalOps.decodeMediaFeatures("video/x-msvideo", avi)(3) == 2.0)
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeMediaFeatures("application/h264", avi)
    }
  }

  test("decode rejects non-image payloads loudly") {
    intercept[IllegalArgumentException] {
      ImageCodec.decodeStats("not a png".getBytes)
    }
  }
}
