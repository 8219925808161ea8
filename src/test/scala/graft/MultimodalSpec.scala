package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Real multimodal decode (JDK codecs): PNG/JPEG via ImageIO, WAV PCM via
  * javax.sound.sampled, and the histogram fallback for undecodable bytes.
  * Images/audio are generated in-test, so the round-trip exercises real
  * codec bytes end-to-end without external fixtures. */
class MultimodalSpec extends AnyFunSuite {

  private def pngBytes(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("PNG round-trip: dims and luminance decode exactly; pooled features match") {
    // left half black, right half white, 8x8
    val bytes = pngBytes(8, 8, (x, _) => if (x < 4) 0x000000 else 0xffffff)
    val img = Multimodal.decodeImage(bytes).get
    assert(img.width === 8 && img.height === 8)
    assert(img.gray(0) === 0.0f)
    assert(math.abs(img.gray(7) - 1.0f) < 1e-6)
    val feats = Multimodal.imageFeatures(img) // 4x4 pool over 2x2 cells
    // cells in columns 0-1 all black, columns 2-3 all white
    for (gy <- 0 until 4; gx <- 0 until 4) {
      val want = if (gx < 2) 0.0 else 1.0
      assert(math.abs(feats(gy * 4 + gx) - want) < 1e-6, s"cell ($gy,$gx)")
    }
  }

  test("JPEG decodes with correct dims (lossy values, structural check)") {
    val img0 = new java.awt.image.BufferedImage(16, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img0, "jpg", bos)
    val img = Multimodal.decodeImage(bos.toByteArray).get
    assert(img.width === 16 && img.height === 9)
    assert(img.gray.forall(v => v >= 0f && v <= 1f))
  }

  test("WAV PCM round-trip: constant-amplitude signal has exact RMS per window") {
    val amp = 8192 // 0.25 of full scale
    val bytes = wavBytes(16000, Array.fill(1600)(amp.toShort))
    val audio = Multimodal.decodeAudio(bytes).get
    assert(audio.sampleRate === 16000)
    assert(audio.samples.length === 1600)
    val feats = Multimodal.audioFeatures(audio)
    assert(feats.length === 16)
    feats.foreach(v => assert(math.abs(v - amp / 32768.0) < 1e-6))
  }

  test("sine WAV: RMS ~ amplitude/sqrt(2)") {
    val sr = 16000
    val amp = 16384.0
    val samples = Array.tabulate(sr / 10)(i =>
      (amp * math.sin(2 * math.Pi * 440 * i / sr)).toShort)
    val audio = Multimodal.decodeAudio(wavBytes(sr, samples)).get
    val rms = Multimodal.audioFeatures(audio, bins = 1).head
    assert(math.abs(rms - (amp / 32768.0) / math.sqrt(2)) < 0.01)
  }

  test("AIFF (big-endian signed PCM) round-trip: exact constant amplitude") {
    val amp = -4096
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true) // BE
    val raw = new Array[Byte](800 * 2)
    (0 until 800).foreach { i =>
      raw(2 * i) = ((amp >> 8) & 0xff).toByte
      raw(2 * i + 1) = (amp & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, 800L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val audio = Multimodal.decodeAudio(bos.toByteArray).get
    assert(audio.samples.length === 800)
    audio.samples.foreach(v => assert(math.abs(v - amp / 32768.0f) < 1e-6))
  }

  test("undecodable bytes fall back to the histogram fingerprint per kind") {
    val junk = "not an image at all".getBytes("UTF-8")
    assert(Multimodal.decodeImage(junk).isEmpty)
    assert(Multimodal.decodeAudio(junk).isEmpty)
    assert(Multimodal.decodeFeatures("image", junk).toSeq === Multimodal.decodeStub(junk).toSeq)
    assert(Multimodal.decodeFeatures("video", junk).toSeq === Multimodal.decodeStub(junk).toSeq)
  }

  test("real decode dispatches through the batched Dataset seam") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val png = pngBytes(4, 4, (_, _) => 0xffffff) // all white -> features all 1.0
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png, Some(4), Some(4), None),
      Multimodal.MediaRow(2L, "image", "junk".getBytes, None, None, None))
    val feats = Multimodal.extractFeatures(rows.toDS(), batchSize = 2)
      .collect().map(f => f.media_id -> f.feature).toMap
    assert(feats(1L).forall(v => math.abs(v - 1.0) < 1e-6))
    assert(feats(2L).toSeq === Multimodal.decodeStub("junk".getBytes).toSeq)
  }
}
