package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference's round-trip law (`testEncode`/`testDecode`,
  * /root/reference/src/test/common/EncodeToolsRunner.ts:103-129) for every
  * codec in the registry over every fixture shape + adversarial edges:
  * decode(encode(x), x.length) must equal x bit-identically.
  */
class CodecSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  private def shapes: Seq[(String, Array[Int])] = {
    val fixtureBlocks = Fixtures.Sources.map { src =>
      // concatenate tokens of fixture docs of this source into one block
      val rows = Fixtures.localRows(600).filter(_.source == src)
      src -> rows.flatMap(_.tokens)
    }.toSeq
    val edges = Seq(
      "empty" -> Array.empty[Int],
      "single" -> Array(12345),
      "all_same" -> Array.fill(5000)(777),
      "two_values" -> Array.tabulate(4096)(i => if (i % 2 == 0) 3 else 50256),
      "outlier" -> (Array.fill(2000)(5) :+ Int.MaxValue),
      "negatives" -> Array.fill(1000)(rnd.nextInt()), // full Int range
      "boundaries" -> Array(0, 50256, 0, 0, 50256, 1, 2, 3),
      "ramp" -> Array.tabulate(10000)(identity),
      "random_small" -> Array.fill(3000)(rnd.nextInt(256))
    )
    fixtureBlocks ++ edges
  }

  for (codec <- CodecRegistry.all; (shapeName, data) <- shapes) {
    val canEncode = codec match {
      case BitPackCodec => data.forall(_ >= 0)
      case FsstCodec => data.forall(v => v >= 0 && v < FsstCodec.SymbolBase)
      case FsstLegacyCodec => false // decode-only dispatch target (ADVICE r7)
      case DictCodec => true // MaxDict is large enough for all shapes here
      case _ => true
    }
    if (canEncode) {
      test(s"${codec.name} round-trips '$shapeName' (${data.length} tokens)") {
        val enc = codec.encode(data)
        val dec = codec.decode(enc, data.length)
        assert(dec.sameElements(data))
      }
    }
  }

  test("estimates are sane upper-ballpark vs actual for fixture shapes") {
    for ((name, data) <- shapes if data.length > 100) {
      val st = Analyzer.stats(data)
      for (codec <- CodecRegistry.all if codec.applicable(st) && codec != FsstCodec) {
        val est = codec.estimate(st)
        val actual = codec.encode(data).length
        // estimate must be within 4x either way (it drives selection only)
        assert(est <= actual.toLong * 4 + 64, s"$name/${codec.name} est $est vs $actual")
        assert(actual <= est * 4 + 64, s"$name/${codec.name} actual $actual vs est $est")
      }
    }
  }

  test("rle: malformed zero-length run fails loud instead of spinning") {
    // hand-built hostile payload: value zigzag(5)=10, run length 0 — a
    // corrupt stream must raise InvalidCodecException, not hang the
    // executor (decodeSlice's skip-ahead advanced by run and would spin)
    val hostile = Array[Byte](10, 0)
    intercept[InvalidCodecException](RleCodec.decode(hostile, 4))
    intercept[InvalidCodecException](RleCodec.decodeSlice(hostile, 4, 1, 3))
    // run overrunning the declared token count is equally malformed
    val overrun = RleCodec.encode(Array.fill(8)(7)) // one run of 8
    intercept[InvalidCodecException](RleCodec.decode(overrun, 4))
    intercept[InvalidCodecException](RleCodec.decodeSlice(overrun, 4, 0, 4))
  }

  test("registry dispatch is closed-world (InvalidCodecException)") {
    intercept[InvalidCodecException](CodecRegistry.byName("nope"))
    intercept[InvalidCodecException](CodecRegistry.byId(99))
    assert(CodecRegistry.byName("rle") eq RleCodec)
    assert(CodecRegistry.byId(5) eq FsstCodec)
  }

  test("registry name/id maps are mutually inverse (MIME-map invariant analog)") {
    // analog of the reference's map-inversion tests
    // (/root/reference/src/test/src/EncodeTools.ts:62-90)
    CodecRegistry.all.foreach { c =>
      assert(CodecRegistry.byId(c.id).name == c.name)
      assert(CodecRegistry.byName(c.name).id == c.id)
    }
    assert(CodecRegistry.all.map(_.id).distinct.size == CodecRegistry.all.size)
    assert(CodecRegistry.all.map(_.name).distinct.size == CodecRegistry.all.size)
  }

  test("fsst compresses repeat_pairs fixture significantly") {
    val data = Fixtures.localRows(800).filter(_.source == "repeat_pairs")
      .flatMap(_.tokens)
    assert(data.length > 10000)
    val enc = FsstCodec.encode(data)
    assert(enc.length < data.length * 4 / 2, // at least 2x vs plain
      s"fsst ${enc.length} bytes vs plain ${data.length * 4}")
  }

  test("rle compresses const_runs fixture significantly") {
    val data = Fixtures.localRows(800).filter(_.source == "const_runs")
      .flatMap(_.tokens)
    val enc = RleCodec.encode(data)
    assert(enc.length < data.length * 4 / 8)
  }

  test("decodeSlice == full decode slice for every sliceable codec and width") {
    val rng = new scala.util.Random(41)
    val shapes: Seq[Array[Int]] = Seq(
      Array.fill(5000)(rng.nextInt(2)),            // 1-bit
      Array.fill(5000)(rng.nextInt(100)),          // 7-bit
      Array.fill(5000)(rng.nextInt(1 << 20)),      // 20-bit
      Array.fill(5000)(rng.nextInt()),             // full range (plain/for/delta wrap)
      Array.fill(5000)(rng.nextInt(300) * 11),     // dict-friendly
      Array.tabulate(5000)(i => i % 977),          // runs of length 1, sawtooth
      {                                            // rle-friendly: long runs
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        while (out.length < 5000) {
          val v = rng.nextInt(50)
          (0 until math.min(1 + rng.nextInt(200), 5000 - out.length))
            .foreach(_ => out += v)
        }
        out.toArray
      },
      Array.tabulate(5000)(i => i * 7 + rng.nextInt(5)) // near-monotonic (delta)
    )
    val codecs: Seq[TokenCodec] =
      Seq(PlainCodec, BitPackCodec, ForCodec, DictCodec, RleCodec, DeltaCodec,
        FsstCodec)
    for (tokens <- shapes; c <- codecs if c.applicable(Analyzer.stats(tokens))) {
      if (c != BitPackCodec || tokens.forall(_ >= 0)) {
        val bytes = c.encode(tokens)
        val full = c.decode(bytes, tokens.length)
        (0 until 20).foreach { _ =>
          val from = rng.nextInt(tokens.length)
          val until = from + rng.nextInt(tokens.length - from) + 1
          val sl = c.decodeSlice(bytes, tokens.length, from, until)
          assert(sl.isDefined, s"${c.name} must support slices")
          assert(sl.get.toSeq == full.slice(from, until).toSeq,
            s"${c.name} [$from,$until)")
        }
        // boundary slices
        assert(c.decodeSlice(bytes, tokens.length, 0, tokens.length).get.toSeq == full.toSeq)
        assert(c.decodeSlice(bytes, tokens.length, 0, 1).get.toSeq == full.take(1).toSeq)
        assert(c.decodeSlice(bytes, tokens.length,
          tokens.length - 1, tokens.length).get.toSeq == full.takeRight(1).toSeq)
      }
    }
    // dict split path slices too
    val toks = Array.fill(4000)(rng.nextInt(500) * 3)
    val dict = DictCodec.train(toks)
    val tb = DictCodec.tableBytes(dict)
    val body = DictCodec.encodeWith(dict, toks).get
    val sl = DictCodec.decodeWithSlice(tb, body, toks.length, 100, 300)
    assert(sl.get.toSeq == toks.slice(100, 300).toSeq)
    // fsst split path: the sync table lets the table-reuse body slice too
    val ft = FsstCodec.train(toks)
    val ftb = FsstCodec.tableBytes(ft)
    val fbody = FsstCodec.encodeWith(ft, toks).get
    val ffull = FsstCodec.decodeWith(ftb, fbody, toks.length)
    assert(ffull.toSeq == toks.toSeq)
    (0 until 20).foreach { _ =>
      val from = rng.nextInt(toks.length)
      val until = from + rng.nextInt(toks.length - from) + 1
      val fsl = FsstCodec.decodeWithSlice(ftb, fbody, toks.length, from, until)
      assert(fsl.get.toSeq == toks.slice(from, until).toSeq, s"fsst [$from,$until)")
    }
  }

  test("fsst sync points: large block slices without full decode, bit-exact") {
    // > several sync intervals of merge-friendly data so the sync table is
    // exercised (repeat pairs merge heavily; interval = 4096 output tokens)
    val rng = new scala.util.Random(57)
    val motifs = Array.tabulate(8)(m => Array.tabulate(16)(i => 100 + m * 31 + i))
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (out.length < 40000) {
      out ++= motifs(rng.nextInt(motifs.length))
      if (rng.nextInt(5) == 0) out += rng.nextInt(1000) // noise breaks runs
    }
    val toks = out.toArray
    val bytes = FsstCodec.encode(toks)
    val full = FsstCodec.decode(bytes, toks.length)
    assert(full.toSeq == toks.toSeq)
    // slices across sync boundaries, including deep-in-block point reads
    Seq((0, 10), (4090, 4200), (20000, 20001), (toks.length - 5, toks.length),
      (8191, 8193), (12288, 16384)).foreach { case (f, u) =>
      val sl = FsstCodec.decodeSlice(bytes, toks.length, f, u)
      assert(sl.isDefined && sl.get.toSeq == toks.slice(f, u).toSeq, s"[$f,$u)")
    }
    (0 until 30).foreach { _ =>
      val f = rng.nextInt(toks.length)
      val u = f + rng.nextInt(toks.length - f) + 1
      assert(FsstCodec.decodeSlice(bytes, toks.length, f, u).get.toSeq ==
        toks.slice(f, u).toSeq, s"[$f,$u)")
    }
  }

  test("fsst legacy (pre-sync-table) bodies still decode, full and sliced") {
    // Blocks persisted by rounds ≤7 carry body = [mergedLen][DictCodec
    // bytes] under the pre-versioned name "fsst"; the structural detector
    // now lives ONLY in FsstLegacyCodec (that name's dispatch target,
    // ADVICE r7) — the "fsst2" writer rejects legacy bodies loudly.
    import Bits._
    val rng = new scala.util.Random(91)
    val motifs = Array.tabulate(8)(m => Array.tabulate(16)(i => 100 + m * 31 + i))
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (out.length < 30000) {
      out ++= motifs(rng.nextInt(motifs.length))
      if (rng.nextInt(5) == 0) out += rng.nextInt(1000)
    }
    val toks = out.toArray
    val t = FsstCodec.train(toks)
    val tb = FsstCodec.tableBytes(t)
    val v2 = FsstCodec.encodeWith(t, toks).get
    // strip the sync table: [mergedLen][nSync][2*nSync deltas][dict] ->
    // [mergedLen][dict], reconstructing the pre-r6 wire layout exactly
    val cur = new Cursor(0)
    val mergedLen = readVarint(v2, cur)
    val nSync = readVarint(v2, cur).toInt
    assert(nSync > 0, "fixture must exercise the sync table")
    var k = 0
    while (k < 2 * nSync) { readVarint(v2, cur); k += 1 }
    val head = new Array[Byte](10)
    val headLen = writeVarint(head, 0, mergedLen)
    val legacy = java.util.Arrays.copyOf(head, headLen) ++
      java.util.Arrays.copyOfRange(v2, cur.pos, v2.length)
    // split path (table column + body column), full + sliced — via the
    // legacy-name dispatch target
    assert(FsstLegacyCodec.decodeWith(tb, legacy, toks.length).toSeq == toks.toSeq)
    Seq((0, 10), (4090, 4200), (20000, 20001), (toks.length - 5, toks.length))
      .foreach { case (f, u) =>
        val sl = FsstLegacyCodec.decodeWithSlice(tb, legacy, toks.length, f, u)
        assert(sl.get.toSeq == toks.slice(f, u).toSeq, s"legacy [$f,$u)")
      }
    // inline path (standalone encode layout = table ++ body)
    val inlineLegacy = tb ++ legacy
    assert(FsstLegacyCodec.decode(inlineLegacy, toks.length).toSeq == toks.toSeq)
    assert(FsstLegacyCodec.decodeSlice(inlineLegacy, toks.length, 5000, 5100).get.toSeq ==
      toks.slice(5000, 5100).toSeq)
    // the legacy codec also decodes CURRENT bodies (rounds 6-7 persisted
    // the sync-table layout under "fsst" too)
    assert(FsstLegacyCodec.decodeWith(tb, v2, toks.length).toSeq == toks.toSeq)
    // and the current layout still decodes identically under fsst2
    assert(FsstCodec.decodeWith(tb, v2, toks.length).toSeq == toks.toSeq)
    // the versioned writer REJECTS legacy bodies instead of sniffing — the
    // ambiguity window is frozen (ADVICE r7)
    intercept[InvalidCodecException](
      FsstCodec.decodeWith(tb, legacy, toks.length))
    intercept[InvalidCodecException](
      FsstCodec.decode(inlineLegacy, toks.length))
    // registry: the legacy name is decode-only; the policy alias writes fsst2
    intercept[InvalidCodecException](FsstLegacyCodec.encode(toks))
    assert(CodecRegistry.byName("fsst") eq FsstLegacyCodec)
    assert(CodecRegistry.byName("fsst2") eq FsstCodec)
    assert(CodecRegistry.forPolicy("fsst") eq FsstCodec)
  }
}
