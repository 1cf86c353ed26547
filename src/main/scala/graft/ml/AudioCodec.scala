package graft.ml

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real JDK audio codec for the multimodal pipeline: WAV (RIFF) PCM encode
  * and decode via `javax.sound.sampled` — in JDK 17 out of the box, the
  * audio analogue of what ImageIO is for PNG. Closes the former
  * `stubDecodeFeatures` seam for `audio/wav`; only video (no JDK codec
  * exists) keeps the documented stub.
  *
  * The synthetic test waveforms are deterministic: sample `t` of asset
  * `id` is `((id*31 + 7*t) mod 4096) - 2048`, a pure integer formula a
  * codec-free SQL oracle re-derives — so the correctness gate verifies an
  * actual WAV encode → decode round trip (RIFF header parse, sample rate
  * and channel recovery, little-endian 16-bit PCM unpack) against
  * independently computed ground truth, not a stub against itself.
  *
  * Runs executor-side inside the decode closure seam like [[ImageCodec]]
  * (ref: the reference treats media as opaque bytes; zync has no media
  * path — this is the training-pipeline extension): payload bytes never
  * shuffle, only small stats rows flow downstream.
  */
object AudioCodec {

  /** Deterministic synthetic 16-bit mono PCM waveform for asset `id`. */
  def syntheticWave(id: Long, nSamples: Int): Array[Short] =
    Array.tabulate(nSamples)(t => (((id * 31 + 7L * t) % 4096) - 2048).toShort)

  /** Encode 16-bit mono PCM samples as a WAV (RIFF) byte payload. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1,
      /* signed = */ true, /* bigEndian = */ false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    val in = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Stats row of one decoded waveform: true format recovered from the
    * RIFF header plus integer-exact sample statistics (Long sums, so the
    * double divisions are bit-reproducible anywhere).
    */
  final case class WavStats(sample_rate: Int, channels: Int, n_samples: Long,
      mean: Double, peak: Int, rms: Double)

  def decodeStats(bytes: Array[Byte]): WavStats = {
    require(bytes != null && bytes.nonEmpty, "payload is not a decodable waveform")
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"unsupported PCM layout: ${fmt.getSampleSizeInBits}-bit " +
          s"bigEndian=${fmt.isBigEndian} (encoder always writes 16-bit LE)")
      val pcm = in.readAllBytes()
      val n = pcm.length / 2
      var (sum, sumSq, peak) = (0L, 0L, 0)
      var i = 0
      while (i < n) {
        val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
        sum += s
        sumSq += s.toLong * s
        if (math.abs(s) > peak) peak = math.abs(s)
        i += 1
      }
      WavStats(fmt.getSampleRate.toInt, fmt.getChannels, n.toLong,
        sum.toDouble / n, peak, math.sqrt(sumSq.toDouble / n))
    } finally in.close()
  }
}
