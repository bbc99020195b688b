package graft

import graft.operators.Multimodal.RealCodecs
import org.scalatest.funsuite.AnyFunSuite

/** The real codec round trips, checked against the closed-form payload
  * definitions (the same math the DuckDB oracles use).
  */
class MultimodalCodecSpec extends AnyFunSuite {

  test("PNG round trip is pixel-exact for 8-bit grayscale") {
    for (id <- Seq(0L, 7L, 123L, 4999L)) {
      val (w, h, luma) = RealCodecs.decodePng(RealCodecs.syntheticPng(id, 32, 16))
      assert((w, h) === ((32, 16)))
      val expect = (for (y <- 0 until 16; x <- 0 until 32)
        yield (id * 31 + y * 7 + x) % 256).sum
      assert(luma === expect)
    }
  }

  test("nearest-neighbor resize picks exactly the mapped source pixels") {
    for (id <- Seq(3L, 42L)) {
      val resized = RealCodecs.resizePng(RealCodecs.syntheticPng(id, 32, 16), 16, 8)
      val (w, h, luma) = RealCodecs.decodePng(resized)
      assert((w, h) === ((16, 8)))
      val expect = (for (y <- 0 until 8; x <- 0 until 16)
        yield (id * 31 + (y * 2) * 7 + (x * 2)) % 256).sum
      assert(luma === expect)
    }
  }

  test("WAV RIFF parse recovers rate, length, and exact sample amplitudes") {
    for (id <- Seq(0L, 13L, 777L)) {
      val n = 1000 + (id % 500).toInt
      val (rate, got, amp) = RealCodecs.decodeWav(RealCodecs.syntheticWav(id, n, 16000))
      assert(rate === 16000)
      assert(got === n)
      val expect = (0 until n).map(i =>
        math.abs(((id * 13 + i * 17) % 65536 - 32768).toInt).toLong).sum
      assert(amp === expect)
    }
  }

  test("WAV parser rejects non-RIFF payloads loudly") {
    val garbage = Array.fill[Byte](64)(42)
    assertThrows[IllegalArgumentException](RealCodecs.decodeWav(garbage))
  }
}
