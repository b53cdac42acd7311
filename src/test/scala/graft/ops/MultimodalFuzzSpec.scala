package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized robustness of the media decoders (raw ScalaCheck, same
  * harness pattern as typedef.PropertySpec): at 100 TB the decode path
  * sees arbitrary corrupt/truncated/adversarial bytes, and a decoder
  * that THROWS kills the executor task where one that falls back to the
  * byte fold loses one row's features. These properties pin the
  * never-throw contract for all three kinds — including size fields
  * chosen to overflow 32-bit chunk arithmetic. */
class MultimodalFuzzSpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  private val kinds = Gen.oneOf("image", "audio", "video")

  /** Structure-free noise of any small size (incl. empty). */
  private val noiseGen: Gen[Array[Byte]] =
    Gen.choose(0, 512).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .map(_.toArray)

  /** A valid synthesized container with targeted damage: byte flips,
    * truncation, or a size field rewritten to an extreme value (the
    * overflow shapes: Int.MaxValue-ish sizes, negatives). */
  private val damagedGen: Gen[(String, Array[Byte])] = for {
    kind <- Gen.oneOf("audio", "video")
    docId <- Gen.choose(0L, 1000L)
    base = if (kind == "audio") Multimodal.synthWav(docId) else Multimodal.synthAvi(docId)
    mode <- Gen.choose(0, 2)
    pos <- Gen.choose(0, base.length - 1)
    b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    ext <- Gen.oneOf(Int.MaxValue, Int.MaxValue - 7, Int.MinValue, -1, 0x7ffffff0)
  } yield {
    val a = base.clone()
    mode match {
      case 0 => // single byte flip anywhere
        a(pos) = b
        (kind, a)
      case 1 => // truncate
        (kind, a.take(pos))
      case 2 => // rewrite a 4-byte size field (word-aligned) to an extreme
        val off = (pos / 4) * 4
        if (off + 4 <= a.length)
          java.nio.ByteBuffer.wrap(a).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            .putInt(off, ext)
        (kind, a)
    }
  }

  private def decodesSafely(kind: String, bytes: Array[Byte]): Boolean = {
    val Seq(f) = Multimodal.decodeBatch(Seq(
      Multimodal.MediaDoc(1L, kind, bytes, 0, 0, 0)))
    // invariants that hold for BOTH a successful decode and the fold:
    // fixed feature arity, byte count faithful, dims either real or -1
    f.features.length == 8 && f.n_bytes == bytes.length &&
      (f.decoded_w >= -1) && (f.decoded_h >= -1)
  }

  test("decoders never throw on arbitrary noise bytes") {
    check(Prop.forAll(kinds, noiseGen) { (kind, bytes) =>
      decodesSafely(kind, bytes)
    }, "noise")
  }

  test("decoders never throw on damaged containers (flips, truncation, overflowing size fields)") {
    check(Prop.forAll(damagedGen) { case (kind, bytes) =>
      decodesSafely(kind, bytes)
    }, "damaged")
  }

  test("an undamaged container still decodes after the hardening") {
    val Seq(v) = Multimodal.decodeBatch(Seq(
      Multimodal.MediaDoc(3L, "video", Multimodal.synthAvi(3L), 0, 0, 0)))
    assert(v.decoded_w == Multimodal.vidW)
    val Seq(a) = Multimodal.decodeBatch(Seq(
      Multimodal.MediaDoc(4L, "audio", Multimodal.synthWav(4L), 0, 0, 0)))
    assert(a.decoded_w == Multimodal.wavFrames)
  }

  // deterministic pins of the two corrupt-header escapes the random
  // properties first caught: headers the platform decoders accept but
  // whose dims fields are garbage must fall back, not leak into dims
  test("a WAV with a corrupt (negative/absurd) sample rate falls back") {
    for (rate <- Seq(Int.MinValue, -1, 0, 200000000)) {
      val b = Multimodal.synthWav(7L)
      // canonical RIFF/WAVE layout: fmt sample-rate field at offset 24
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(24, rate)
      val Seq(f) = Multimodal.decodeBatch(Seq(
        Multimodal.MediaDoc(7L, "audio", b, 0, 0, 0)))
      assert(f.decoded_w == -1 && f.decoded_h == -1,
        s"rate=$rate escaped as dims ${f.decoded_w} x ${f.decoded_h}")
      assert(f.features.length == 8 && f.n_bytes == b.length)
    }
  }

  test("regression: a WAV with a huge channel count / frame size cannot wedge the decoder") {
    // the round-10 live catch: AudioInputStream.read refuses partial
    // frames and returns 0 when the buffer is smaller than frameSize;
    // InputStream.readAllBytes retries a 0-return forever — one corrupt
    // blob then spins an executor core indefinitely (observed 28
    // CPU-minutes before the suite was killed). The fix gates absurd
    // channel counts AND treats a 0-return as EOF in a bounded manual
    // read. Deterministic reproduction of the fuzz input shape:
    val b = Multimodal.synthWav(5L)
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(22, 0x7fff.toShort) // fmt channels → 32767
    bb.putShort(32, 0x7ffe.toShort) // fmt block align (frame size) → 32766
    @volatile var ok = false
    val t = new Thread(() => { ok = decodesSafely("audio", b) })
    t.setDaemon(true)
    t.start()
    t.join(30000)
    assert(!t.isAlive, "decode wedged on the huge-frame WAV (the readAllBytes spin)")
    assert(ok, "huge-frame WAV broke the decode invariants")
  }

  test("a WAV whose frame size exceeds the container decodes ZERO frames and falls back") {
    // the advice-flagged escape next to the spin fix: when frameSize is
    // bigger than the whole payload, the first bounded read 0-returns
    // immediately — zero frames from a nonempty container is a
    // MALFORMED header, not silent audio, and must fall back to the
    // byte fold (dims -1), never report Some(frames=0)
    // channels must change too: the JDK WAV reader recomputes frameSize
    // as channels × bits/8, ignoring a lone blockAlign rewrite. 1000
    // channels passes the ≤1024 sanity gate but makes frameSize 2000 >
    // the 844-byte container — exactly the advice's escape shape.
    val b = Multimodal.synthWav(9L)
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(22, 1000.toShort) // fmt channels
    bb.putShort(32, 2000.toShort) // fmt block align (frame size) > container length
    val Seq(f) = Multimodal.decodeBatch(Seq(
      Multimodal.MediaDoc(9L, "audio", b, 0, 0, 0)))
    assert(f.decoded_w == -1 && f.decoded_h == -1,
      s"zero-frame decode escaped as dims ${f.decoded_w} x ${f.decoded_h}")
    assert(f.features.length == 8 && f.n_bytes == b.length)
  }

  test("an AVI whose avih dims are corrupt falls back even for codec'd frames") {
    // minimal MJPEG-shape AVI (one real JPEG 00dc frame) with garbage
    // avih width/height — ImageIO decodes the frame fine, so only the
    // end-of-walk dims gate stands between the garbage and the result
    val im = new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    val jpeg = bos.toByteArray
    val jlen = jpeg.length + (jpeg.length & 1)
    val total = 12 + (12 + 8 + 56) + (12 + 8 + jlen)
    for ((w, h) <- Seq((-6, 4), (6, -4), (0, 0), (Int.MinValue, 4))) {
      val bb = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def cc(s: String): Unit = { bb.put(s.getBytes("US-ASCII")); () }
      cc("RIFF"); bb.putInt(total - 8); cc("AVI ")
      cc("LIST"); bb.putInt(4 + 8 + 56); cc("hdrl")
      cc("avih"); bb.putInt(56)
      bb.putInt(100000); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      bb.putInt(1); bb.putInt(0); bb.putInt(1); bb.putInt(0)
      bb.putInt(w); bb.putInt(h)
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      cc("LIST"); bb.putInt(4 + 8 + jlen); cc("movi")
      cc("00dc"); bb.putInt(jpeg.length); bb.put(jpeg)
      if ((jpeg.length & 1) == 1) bb.put(0.toByte)
      val Seq(f) = Multimodal.decodeBatch(Seq(
        Multimodal.MediaDoc(8L, "video", bb.array(), 0, 0, 0)))
      assert(f.decoded_w == -1 && f.decoded_h == -1,
        s"avih dims ($w, $h) escaped as ${f.decoded_w} x ${f.decoded_h}")
      assert(f.features.length == 8 && f.n_bytes == total)
    }
  }
}
