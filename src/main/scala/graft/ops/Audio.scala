package graft.ops

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions.udf

/** Audio column ops on JDK-native codecs (`javax.sound.sampled`: WAV/AIFF/
  * AU PCM) — the audio leg of the multimodal layer (ref `daft/functions/
  * audio.py`; compressed codecs like MP3/AAC need external libs and stay
  * out of scope offline, same posture as video).
  *
  * Execution shape: scalar UDFs over binary columns — pure map, no
  * shuffle; heavy per-row decode parallelizes with the scan. */
object Audio {

  /** Decoded audio: interleaved samples normalized to [-1, 1]. */
  case class AudioClip(samples: Array[Float], sampleRate: Float, channels: Int) {
    def numFrames: Long = samples.length / math.max(channels, 1)
    def durationSec: Double = numFrames / sampleRate.toDouble
  }

  /** Decode PCM container bytes (WAV/AIFF/AU) → AudioClip; None when the
    * bytes are not decodable audio. */
  def decode(bytes: Array[Byte]): Option[AudioClip] = {
    if (bytes == null) return None
    try {
      val in: AudioInputStream =
        AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val raw = in.readAllBytes()
      in.close()
      val big = fmt.isBigEndian
      val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
      val bytesPer = bits / 8
      val n = raw.length / bytesPer
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        val o = i * bytesPer
        val v: Int = bytesPer match {
          case 1 =>
            if (signed) raw(o).toInt else (raw(o) & 0xff) - 128
          case 2 =>
            val (b0, b1) = if (big) (raw(o), raw(o + 1)) else (raw(o + 1), raw(o))
            (b0 << 8) | (b1 & 0xff)
          case _ => // 24/32-bit: take top 16 bits
            val (hi, lo) =
              if (big) (raw(o), raw(o + 1)) else (raw(o + bytesPer - 1), raw(o + bytesPer - 2))
            (hi << 8) | (lo & 0xff)
        }
        val denom = if (bytesPer == 1) 128f else 32768f
        out(i) = v / denom
        i += 1
      }
      Some(AudioClip(out, fmt.getSampleRate, ch))
    } catch { case _: Exception => None }
  }

  /** Encode mono float samples → 16-bit PCM WAV bytes (deterministic —
    * used for fixtures and as the write path). */
  def encodeWav(samples: Array[Float], sampleRate: Float): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-1f, math.min(1f, samples(i)))
      val s = math.round(v * 32767f).toShort
      pcm(i * 2) = (s & 0xff).toByte // little-endian
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Naive integer-factor downsample (every k-th frame, mono input) —
    * the resample slot; production resamplers add a low-pass filter. */
  def downsample(clip: AudioClip, factor: Int): AudioClip = {
    require(clip.channels == 1, "downsample expects mono")
    val out = Array.tabulate(clip.samples.length / factor)(i => clip.samples(i * factor))
    AudioClip(out, clip.sampleRate / factor, 1)
  }

  /** Arbitrary-rate resampling by linear interpolation (ref
    * functions/audio.py:122 `resample`; the reference delegates to an
    * audio library — this is the same operation from first principles).
    * Mono PCM in, mono PCM at `targetRate` out. */
  def resample(clip: AudioClip, targetRate: Float): AudioClip = {
    require(clip.channels == 1, "resample expects mono")
    require(targetRate > 0, s"bad target rate $targetRate")
    if (targetRate == clip.sampleRate || clip.samples.isEmpty)
      return clip.copy(sampleRate = targetRate)
    val ratio = clip.sampleRate / targetRate
    val outLen = math.max(1, math.round(clip.samples.length / ratio).toInt)
    val out = Array.tabulate(outLen) { i =>
      val pos = i * ratio
      val i0 = math.min(pos.toInt, clip.samples.length - 1)
      val i1 = math.min(i0 + 1, clip.samples.length - 1)
      val frac = pos - i0
      (clip.samples(i0) + (clip.samples(i1) - clip.samples(i0)) * frac).toFloat
    }
    AudioClip(out, targetRate, 1)
  }

  // ---- Column-level UDF surface ----
  val decodeUdf = udf((b: Array[Byte]) => decode(b))
  val durationUdf = udf((b: Array[Byte]) => decode(b).map(_.durationSec))
  val rmsUdf = udf((b: Array[Byte]) => decode(b).map { c =>
    math.sqrt(c.samples.foldLeft(0.0)((a, x) => a + x.toDouble * x) / math.max(c.samples.length, 1))
  })
  /** WAV bytes → resampled sample tensor (float64, like the reference's
    * resample return dtype). */
  val resampleUdf = udf((b: Array[Byte], rate: Int) =>
    decode(b).map(c => resample(c, rate.toFloat).samples.map(_.toDouble)))
}
