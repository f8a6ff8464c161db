package graft

import java.awt.image.BufferedImage
import java.nio.file.Files
import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end image decode through the real distribution plumbing:
  * generated PNGs go binaryFile → mapPartitions → javax.imageio and
  * come back with true dimensions; non-image bytes take the documented
  * deterministic stub fallback. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writePng(dir: java.nio.file.Path, name: String, w: Int, h: Int): Unit = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + y * 13) % 256) * 0x010101) // deterministic gray ramp
    ImageIO.write(img, "png", dir.resolve(name).toFile)
  }

  test("generated PNGs decode end-to-end with true dimensions and bands") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_png")
    writePng(dir, "a.png", 37, 21)
    writePng(dir, "b.png", 300, 200)
    val feats = graft.engine.Multimodal
      .decodeImages(graft.engine.Multimodal.readBinary(spark, dir.toString, "*.png"))
      .collect().map(f => f.path.split('/').last -> f).toMap
    assert(feats("a.png").width == 37 && feats("a.png").height == 21)
    assert(feats("b.png").width == 300 && feats("b.png").height == 200)
    // TYPE_INT_RGB rasters carry 3 bands; histogram mass = min(pixels, 64Ki)
    assert(feats("a.png").channels == 3)
    assert(feats("a.png").histogram.sum.toLong == 37L * 21L)
    assert(feats("b.png").histogram.sum.toLong == 300L * 200L)
  }

  test("non-image bytes fall back to the deterministic stub") {
    val junk = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val f = graft.engine.Multimodal.imageioDecode("x.bin", junk)
    assert(f.isEmpty)
    val stub = graft.engine.Multimodal.stubDecode("x.bin", junk)
    assert(stub.width == 64 + 1000 % 512 && stub.height == 64 + (1000 / 7) % 512)
    assert(stub.histogram.sum.toLong == 1000L)
  }

  test("a PNG byte stream routed through decodeImages uses the real decoder") {
    // the dispatch inside the mapPartitions kernel: imageio first
    val img = new BufferedImage(5, 9, BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val decoded = graft.engine.Multimodal.imageioDecode("m.png", bos.toByteArray)
    assert(decoded.exists(f => f.width == 5 && f.height == 9))
  }

  /** 16-bit PCM mono WAV of a full-scale-ish sine at `hz`. */
  private def writeWav(dir: java.nio.file.Path, name: String,
                       sampleRate: Int, nFrames: Int, hz: Double,
                       amp: Double): Unit = {
    import javax.sound.sampled._
    val pcm = new Array[Byte](nFrames * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until nFrames).foreach { i =>
      bb.putShort((math.sin(2 * math.Pi * hz * i / sampleRate) * amp * 32767).toShort)
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, dir.resolve(name).toFile)
  }

  test("generated WAVs decode end-to-end with true rate/frames/duration/RMS") {
    val dir = Files.createTempDirectory("graft_wav")
    writeWav(dir, "tone.wav", sampleRate = 8000, nFrames = 4000,
      hz = 440.0, amp = 0.5)
    val feats = graft.engine.Multimodal
      .decodeAudio(graft.engine.Multimodal.readBinary(spark, dir.toString, "*.wav"))
      .collect()
    assert(feats.length == 1)
    val f = feats.head
    assert(f.sample_rate == 8000 && f.channels == 1 && f.n_frames == 4000L)
    assert(math.abs(f.duration_sec - 0.5) < 1e-9)
    // a sine of amplitude a has RMS a/sqrt(2)
    assert(math.abs(f.rms - 0.5 / math.sqrt(2.0)) < 0.01,
      s"rms ${f.rms} should be ~${0.5 / math.sqrt(2.0)}")
  }

  test("non-audio bytes fall back to the deterministic audio stub") {
    val junk = Array.tabulate[Byte](800)(i => (i % 97).toByte)
    assert(graft.engine.Multimodal.audioDecode("x.bin", junk).isEmpty)
    val stub = graft.engine.Multimodal.stubAudio("x.bin", junk)
    assert(stub.n_frames == 200L && stub.sample_rate == 16000)
  }
}
