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
}
