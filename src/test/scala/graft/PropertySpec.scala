package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** ScalaCheck properties (FIXTURES.md): generator-driven round-trip laws
  * with a fixed seed and shrinking — the upgrade over the reference's
  * unseeded Chance draws. Run through raw ScalaCheck (no scalatestplus in
  * the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 200): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: $res")
  }

  // generators mirroring the fixture win-regions + adversarial shapes
  private val genConstRuns: Gen[Array[Int]] = for {
    vals <- Gen.nonEmptyListOf(Gen.chooseNum(0, 50256))
    runs <- Gen.listOfN(vals.size, Gen.chooseNum(1, 300))
  } yield vals.zip(runs).flatMap { case (v, r) => List.fill(r)(v) }.toArray

  private val genSmallAlpha: Gen[Array[Int]] = for {
    alpha <- Gen.listOfN(16, Gen.chooseNum(0, 50256))
    n <- Gen.chooseNum(0, 3000)
    xs <- Gen.listOfN(n, Gen.oneOf(alpha))
  } yield xs.toArray

  private val genNarrow: Gen[Array[Int]] = for {
    base <- Gen.chooseNum(Int.MinValue + 2000, Int.MaxValue - 2000)
    n <- Gen.chooseNum(0, 2000)
    xs <- Gen.listOfN(n, Gen.chooseNum(0, 1023))
  } yield xs.map(_ + base).toArray

  private val genOutlier: Gen[Array[Int]] = for {
    body <- Gen.listOf(Gen.chooseNum(0, 255))
    pos <- Gen.chooseNum(0, math.max(body.size - 1, 0))
    outlier <- Gen.oneOf(Int.MaxValue, Int.MinValue, 0, -1)
  } yield {
    val a = body.toArray
    if (a.nonEmpty) a(pos) = outlier
    a
  }

  private val genAny: Gen[Array[Int]] =
    Gen.listOf(Gen.chooseNum(Int.MinValue, Int.MaxValue)).map(_.toArray)

  private val shapes = Seq(
    "const_runs" -> genConstRuns, "small_alpha" -> genSmallAlpha,
    "narrow" -> genNarrow, "outlier" -> genOutlier, "any" -> genAny)

  for ((shapeName, gen) <- shapes; codec <- CodecRegistry.all) {
    test(s"prop: ${codec.name} round-trips $shapeName") {
      check(s"${codec.name}/$shapeName", Prop.forAll(gen) { a =>
        val st = Analyzer.stats(a)
        // respect applicability the same way the engine does
        if (!codec.applicable(st) ||
          (codec == BitPackCodec && st.min < 0) ||
          (codec == FsstCodec && (st.min < 0 || st.max >= FsstCodec.SymbolBase)))
          true
        else codec.decode(codec.encode(a), a.length).sameElements(a)
      }, n = 120)
    }
  }

  test("prop: auto-selected codec always round-trips and never beats plain by being wrong") {
    check("auto", Prop.forAll(Gen.oneOf(shapes.map(_._2)).flatMap(identity)) { a =>
      val st = Analyzer.stats(a)
      val c = Analyzer.select(st)
      c.applicable(st) && c.decode(c.encode(a), a.length).sameElements(a)
    }, n = 300)
  }

  test("prop: streaming checksum == byte-layout checksum") {
    val rows = Gen.listOf(Gen.listOf(Gen.chooseNum(Int.MinValue, Int.MaxValue)))
    check("checksum", Prop.forAll(rows) { rs =>
      val arrays = rs.map(_.toArray).toArray
      Checksum.blockChecksum(arrays) ==
        Checksum.blockChecksumFlat(arrays.map(_.length), arrays.flatten)
    })
  }

  test("prop: partIdOf is total, stable, and respects ranges") {
    val genSample = Gen.listOf(
      Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.chooseNum(0L, 10000L)))
    check("planner", Prop.forAll(genSample, Gen.chooseNum(1, 64)) { (s, parts) =>
      val sorted = s.distinctBy(_._1).sortBy(_._1).toArray
      val plan = Planner.fromSample(sorted, parts)
      sorted.forall { case (id, _) =>
        val p = plan.partIdOf(id)
        p >= 0 && p < plan.numParts && p == plan.partIdOf(id)
      }
    })
  }
}
