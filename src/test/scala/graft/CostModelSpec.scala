package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cost model must pick the right codec in each fixture win-region
  * (FIXTURES.md table), and its choice must never be far from the true
  * argmin (selection regret bound).
  */
class CostModelSpec extends AnyFunSuite {

  private def blockOf(source: String, nDocs: Int = 800): Array[Int] =
    Fixtures.localRows(nDocs).filter(_.source == source).flatMap(_.tokens)

  test("const_runs selects rle") {
    val st = Analyzer.stats(blockOf("const_runs"))
    assert(Analyzer.select(st).name == "rle")
  }

  test("small_alpha selects a dictionary-family codec") {
    val sel = Analyzer.select(Analyzer.stats(blockOf("small_alpha"))).name
    assert(Set("dict", "fsst2").contains(sel), sel)
  }

  test("narrow_band selects frame-of-reference (or dict if tighter)") {
    val sel = Analyzer.select(Analyzer.stats(blockOf("narrow_band"))).name
    assert(Set("for", "dict", "bitpack").contains(sel), sel)
  }

  test("repeat_pairs selects fsst") {
    val sel = Analyzer.select(Analyzer.stats(blockOf("repeat_pairs"))).name
    assert(sel == "fsst2", sel)
  }

  test("sorted posting-list shape selects delta") {
    // strictly increasing with small steps over a huge range: range-width
    // defeats FOR/bitpack, distinct==n defeats dict, runs==n defeats rle —
    // the step-width cue (maxDeltaZz) is the only one that sees the order
    val rnd = new scala.util.Random(7)
    var v = -1000000000
    val data = Array.fill(50000) { v += 1 + rnd.nextInt(7); v }
    val st = Analyzer.stats(data)
    val sel = Analyzer.select(st)
    assert(sel.name == "delta", sel.name)
    // and the estimate is exact for delta (fixed-width wire law)
    assert(DeltaCodec.estimate(st) == DeltaCodec.encode(data).length.toLong)
  }

  test("delta wraparound: extreme jumps round-trip bit-exact") {
    val data = Array(Int.MinValue, Int.MaxValue, -1, 1, 0,
      Int.MaxValue, Int.MinValue, 42)
    assert(DeltaCodec.decode(DeltaCodec.encode(data), data.length)
      .sameElements(data))
  }

  test("uniform_full does not pick an expensive loser") {
    val data = blockOf("uniform_full")
    val st = Analyzer.stats(data)
    val sel = Analyzer.select(st)
    val actual = sel.encode(data).length
    assert(actual <= data.length * 4, s"${sel.name} expanded the block")
  }

  test("selection regret: chosen codec within 25% of true argmin on all fixtures") {
    for (src <- Fixtures.Sources) {
      val data = blockOf(src, 400)
      val st = Analyzer.stats(data)
      val chosen = Analyzer.select(st)
      val chosenSize = chosen.encode(data).length
      val bestSize = CodecRegistry.all
        .filter(_.applicable(st))
        .filter(c => !(c == BitPackCodec && st.min < 0))
        .map(_.encode(data).length).min
      assert(chosenSize <= bestSize * 1.25 + 64,
        s"$src: chose ${chosen.name} ($chosenSize) but best is $bestSize")
    }
  }

  test("forced policy dispatch + unknown policy fails closed") {
    val st = Analyzer.stats(Array(1, 2, 3))
    assert(Analyzer.select(st, "plain").name == "plain")
    assert(Analyzer.select(st, "rle").name == "rle")
    intercept[InvalidCodecException](Analyzer.select(st, "zzz"))
  }

  test("selection is deterministic") {
    val data = blockOf("zipf_text")
    val st1 = Analyzer.stats(data)
    val st2 = Analyzer.stats(data.clone())
    assert(st1 == st2)
    assert(Analyzer.select(st1).name == Analyzer.select(st2).name)
  }
}
