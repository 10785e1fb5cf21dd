package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-8 DictCodec kernels (bitmap train, dense-LUT
  * encodeWith) byte-for-byte to the original sort-dedupe / binary-search
  * logic, reimplemented here as the reference. The dict layout is wire
  * format — any divergence is a persisted-data corruption, so
  * "equivalent" must mean identical bytes, not just a round trip.
  */
class DictKernelSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(0xD1C7)

  private def legacyTrain(tokens: Array[Int]): Array[Int] = {
    val sorted = tokens.clone()
    java.util.Arrays.sort(sorted)
    var d = 0
    var i = 0
    while (i < sorted.length) {
      if (d == 0 || sorted(i) != sorted(d - 1)) { sorted(d) = sorted(i); d += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(sorted, d)
  }

  private def legacyEncodeWith(dict: Array[Int], tokens: Array[Int]): Option[Array[Byte]] = {
    val codes = new Array[Int](tokens.length)
    var i = 0
    while (i < tokens.length) {
      val c = java.util.Arrays.binarySearch(dict, tokens(i))
      if (c < 0) return None
      codes(i) = c
      i += 1
    }
    val w = if (dict.length <= 1) 0 else Bits.bitsNeeded(dict.length - 1)
    val out = new Array[Byte](1 + Bits.packedSize(tokens.length, w))
    out(0) = w.toByte
    Bits.pack(codes, 0, codes.length, w, out, 1)
    Some(out)
  }

  private def check(tokens: Array[Int], label: String): Unit = {
    val dict = DictCodec.train(tokens)
    val ref = legacyTrain(tokens)
    assert(java.util.Arrays.equals(dict, ref), s"train differs on $label")
    val enc = DictCodec.encodeWith(dict, tokens)
    val refEnc = legacyEncodeWith(ref, tokens)
    assert(enc.isDefined === refEnc.isDefined, s"encode presence differs on $label")
    for (a <- enc; b <- refEnc)
      assert(java.util.Arrays.equals(a, b), s"encode bytes differ on $label")
    // full-codec byte identity + round trip
    val full = DictCodec.encode(tokens)
    assert(DictCodec.decode(full, tokens.length).sameElements(tokens), s"round trip on $label")
  }

  test("vocab-sized blocks (bitmap train + LUT encode)") {
    for (trial <- 1 to 40) {
      val n = 1 + rnd.nextInt(20000)
      val vocab = 1 + rnd.nextInt(120000)
      val base = rnd.nextInt(2000) - 1000
      check(Array.fill(n)(base + rnd.nextInt(vocab)), s"vocab trial $trial")
    }
  }

  test("wide-range blocks (sort train + binary-search encode)") {
    for (trial <- 1 to 15) {
      val n = 1 + rnd.nextInt(4096)
      check(Array.fill(n)(rnd.nextInt()), s"wide trial $trial")
    }
  }

  test("span boundaries around the bitmap and LUT caps") {
    // dict span just under / at the LUT cap (1<<20) and the bitmap
    // range cap (1<<22): all four combinations must agree with legacy
    for (span <- Seq((1 << 20) - 1, 1 << 20, (1 << 22) - 1, 1 << 22)) {
      val toks = Array(-5, -5 + span, 0, 17, 17, -5)
      check(toks, s"span $span")
    }
  }

  test("degenerate blocks") {
    check(Array.emptyIntArray, "empty")
    check(Array(42), "single")
    check(Array.fill(5000)(7), "constant")
    check(Array(Int.MinValue, Int.MaxValue), "extremes (wide path)")
    check(Array.tabulate(300)(identity), "dense ramp")
  }

  test("cached-dict reuse: absent values return None on both paths") {
    // LUT path: token inside the span but not in the dict; below base;
    // above top
    val dict = DictCodec.train(Array(10, 20, 30, 40))
    assert(DictCodec.encodeWith(dict, Array(10, 25)).isEmpty, "gap value")
    assert(DictCodec.encodeWith(dict, Array(5)).isEmpty, "below base")
    assert(DictCodec.encodeWith(dict, Array(45)).isEmpty, "above top")
    assert(DictCodec.encodeWith(dict, Array(10, 40, 20)).isDefined, "members")
    // wide path: same contract through binary search
    val wide = DictCodec.train(Array(Int.MinValue, 0, Int.MaxValue))
    assert(DictCodec.encodeWith(wide, Array(1)).isEmpty, "wide gap value")
    assert(DictCodec.encodeWith(wide, Array(Int.MaxValue, 0)).isDefined, "wide members")
  }

  test("LUT amortization gate (r9): small block vs wide-span dict stays byte-identical") {
    // the r9 gate skips the O(span) LUT fill when tokens.length*64 < span
    // (a few hundred tokens against a ~1 MiB-span dict paid more for the
    // fill than the binary searches it replaced — ADVICE r8); both sides
    // of the boundary must produce the same bytes as the legacy kernel
    for ((n, spread) <- Seq((100, 1 << 19), (100, 1 << 12), (16384, 1 << 19))) {
      val toks = Array.tabulate(n)(i => (i * (spread / math.max(n, 1) + 1)) % spread)
      check(toks, s"gate n=$n spread=$spread")
      val dict = DictCodec.train(toks)
      // reuse against the just-trained dict exercises the cached-LUT hit
      // (when built) or the repeated binary-search path (when gated off)
      val again = DictCodec.encodeWith(dict, toks)
      val ref = legacyEncodeWith(dict, toks)
      assert(again.isDefined && java.util.Arrays.equals(again.get, ref.get))
    }
  }

  test("LUT cache keyed by dict instance, not contents") {
    val d1 = DictCodec.train(Array(1, 2, 3))
    val d2 = DictCodec.train(Array(1, 2, 4))
    // interleave two dicts on one thread; stale-cache reuse would code
    // 4 as index of 3's slot or reject a member
    assert(DictCodec.encodeWith(d1, Array(3, 1)).isDefined)
    assert(DictCodec.encodeWith(d2, Array(4, 1)).isDefined)
    assert(DictCodec.encodeWith(d1, Array(4)).isEmpty)
    assert(DictCodec.encodeWith(d2, Array(3)).isEmpty)
    val b1 = DictCodec.encodeWith(d1, Array(1, 2, 3)).get
    val b1ref = legacyEncodeWith(d1, Array(1, 2, 3)).get
    assert(java.util.Arrays.equals(b1, b1ref))
  }
}
