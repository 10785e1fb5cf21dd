package graft

import org.scalatest.funsuite.AnyFunSuite

class SerialSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = Encodings.hex(b)

  // ---- msgpack: published spec examples (msgpack.org format spec) ----

  test("msgpack wire vectors") {
    assert(hex(MsgPack.pack(1L)) == "01")
    assert(hex(MsgPack.pack(127L)) == "7f")
    assert(hex(MsgPack.pack(-1L)) == "ff")
    assert(hex(MsgPack.pack(-32L)) == "e0")
    assert(hex(MsgPack.pack(128L)) == "cc80")
    assert(hex(MsgPack.pack(256L)) == "cd0100")
    assert(hex(MsgPack.pack(-33L)) == "d0df")
    assert(hex(MsgPack.pack(null)) == "c0")
    assert(hex(MsgPack.pack(true)) == "c3")
    assert(hex(MsgPack.pack(false)) == "c2")
    assert(hex(MsgPack.pack("abc")) == "a3616263")
    assert(hex(MsgPack.pack(Seq(1L, 2L, 3L))) == "93010203")
    // the msgpack.org homepage example: {"compact":true,"schema":0} -> 18 bytes
    val home = MsgPack.pack(Map("compact" -> true, "schema" -> 0L))
    assert(hex(home) == "82a7636f6d70616374c3a6736368656d6100")
    assert(home.length == 18)
  }

  test("msgpack round-trips the full value model") {
    val v = Map(
      "id" -> 42L,
      "name" -> "héllo ☃",
      "ok" -> true,
      "none" -> null,
      "pi" -> 3.25,
      "xs" -> Seq(1L, -2L, Seq("nested"), Map("k" -> "v")),
      "big" -> 9007199254740993L,
      "neg" -> -123456789012345L
    )
    assert(MsgPack.unpack(MsgPack.pack(v)) == v)
  }

  test("msgpack bin + long string/array/map length tiers") {
    val bytes = Array.tabulate(300)(_.toByte)
    assert(java.util.Arrays.equals(
      MsgPack.unpack(MsgPack.pack(bytes)).asInstanceOf[Array[Byte]], bytes))
    val longStr = "x" * 70000
    assert(MsgPack.unpack(MsgPack.pack(longStr)) == longStr)
    val bigArr = Vector.tabulate(20)(i => i.toLong)
    assert(MsgPack.unpack(MsgPack.pack(bigArr)) == bigArr)
    val bigMap = (0 until 20).map(i => s"k$i" -> i.toLong).toMap
    assert(MsgPack.unpack(MsgPack.pack(bigMap)) == bigMap)
  }

  // ---- cbor: RFC 8949 appendix A vectors ----

  test("cbor RFC 8949 appendix A vectors") {
    assert(hex(Cbor.encode(0L)) == "00")
    assert(hex(Cbor.encode(1L)) == "01")
    assert(hex(Cbor.encode(10L)) == "0a")
    assert(hex(Cbor.encode(23L)) == "17")
    assert(hex(Cbor.encode(24L)) == "1818")
    assert(hex(Cbor.encode(100L)) == "1864")
    assert(hex(Cbor.encode(1000000L)) == "1a000f4240")
    assert(hex(Cbor.encode(-1L)) == "20")
    assert(hex(Cbor.encode(-10L)) == "29")
    assert(hex(Cbor.encode(-100L)) == "3863")
    assert(hex(Cbor.encode("a")) == "6161")
    assert(hex(Cbor.encode("IETF")) == "6449455446")
    assert(hex(Cbor.encode(Seq(1L, 2L, 3L))) == "83010203")
    assert(hex(Cbor.encode(Map("a" -> 1L))) == "a1616101")
    assert(hex(Cbor.encode(1.1)) == "fb3ff199999999999a")
    assert(hex(Cbor.encode(true)) == "f5")
    assert(hex(Cbor.encode(false)) == "f4")
    assert(hex(Cbor.encode(null)) == "f6")
    // "ü" (ü) -> 0x62c3bc
    assert(hex(Cbor.encode("ü")) == "62c3bc")
  }

  test("cbor decodes RFC half-precision floats") {
    // appendix A: 0xf93c00 = 1.0, 0xf9c400 = -4.0
    assert(Cbor.decode(Encodings.unhex("f93c00")) == 1.0)
    assert(Cbor.decode(Encodings.unhex("f9c400")) == -4.0)
  }

  test("cbor round-trips the full value model") {
    val v = Map(
      "id" -> 42L,
      "name" -> "héllo ☃",
      "ok" -> true,
      "none" -> null,
      "pi" -> 3.25,
      "xs" -> Seq(1L, -2L, Seq("nested"), Map("k" -> "v")),
      "bytes-free" -> "ascii"
    )
    assert(Cbor.decode(Cbor.encode(v)) == v)
    val bytes = Array.tabulate(300)(_.toByte)
    assert(java.util.Arrays.equals(
      Cbor.decode(Cbor.encode(bytes)).asInstanceOf[Array[Byte]], bytes))
  }

  // ---- dispatch + json ----

  test("serialization dispatch round-trips every format") {
    val v = Map("a" -> 1L, "b" -> Seq("x", "y"), "c" -> Map("d" -> true))
    Seq("json", "json5", "msgpack", "cbor", "bson").foreach { f =>
      assert(Serialization.deserialize(f, Serialization.serialize(f, v)) == v,
        s"format $f")
    }
    intercept[InvalidCodecException](Serialization.deserialize("xml", Array[Byte](1)))
  }

  test("json value model: escapes, numbers, nesting") {
    val v = Map("s" -> "a\"b\\c\nd\tef", "n" -> -17L, "d" -> 2.5,
      "xs" -> Seq(1L, 2L), "m" -> Map("k" -> null))
    assert(JsonValue.parse(JsonValue.render(v)) == v)
    assert(JsonValue.render(Map.empty[String, Any]) == "{}")
    assert(JsonValue.parse("[]") == Vector.empty)
    assert(JsonValue.parse("  {\"a\": [1, 2.5, true, null]} ") ==
      Map("a" -> Vector(1L, 2.5, true, null)))
  }

  test("msgpack/cbor property: random values round-trip") {
    val rng = new scala.util.Random(7)
    def randValue(depth: Int): Any = rng.nextInt(if (depth > 2) 5 else 8) match {
      case 0 => rng.nextLong()
      case 1 => rng.nextString(rng.nextInt(40))
      case 2 => rng.nextBoolean()
      case 3 => null
      case 4 => rng.nextDouble()
      case 5 => Vector.fill(rng.nextInt(5))(randValue(depth + 1))
      case 6 => (0 until rng.nextInt(5)).map(i => s"k$i" -> randValue(depth + 1)).toMap
      case 7 => rng.nextLong().toString.getBytes("UTF-8")
    }
    (1 to 200).foreach { _ =>
      val v = randValue(0)
      def norm(x: Any): Any = x match {
        case b: Array[Byte] => b.toSeq
        case s: Seq[_] => s.map(norm)
        case m: Map[_, _] => m.map { case (k, y) => (k, norm(y)) }
        case other => other
      }
      assert(norm(MsgPack.unpack(MsgPack.pack(v))) == norm(v))
      assert(norm(Cbor.decode(Cbor.encode(v))) == norm(v))
    }
  }

  test("bson: published bsonspec.org example documents encode byte-exactly") {
    // bsonspec.org §Specification, the two worked examples
    assert(Encodings.hex(Bson.encode(Map("hello" -> "world"))) ==
      "160000000268656c6c6f0006000000776f726c640000")
    assert(Encodings.hex(Bson.encode(Map("BSON" -> Vector("awesome", 5.05, 1986L)))) ==
      "310000000442534f4e002600000002300008000000617765736f6d650001310033333333" +
        "33331440103200c20700000000")
  }

  test("bson: value-model round-trip incl. int32/int64 split, binary, nesting") {
    def norm(x: Any): Any = x match {
      case b: Array[Byte] => b.toSeq
      case s: Seq[_] => s.map(norm)
      case m: Map[_, _] => m.map { case (k, y) => (k, norm(y)) }
      case other => other
    }
    val v = Map(
      "i32" -> 42L, "i32neg" -> -7L, "i64" -> (1L << 40), "i64neg" -> -(1L << 40),
      "d" -> 2.5, "s" -> "héllo", "b" -> true, "n" -> null,
      "bin" -> Array[Byte](1, 2, -3),
      "arr" -> Vector(1L, "two", Vector(3L)),
      "doc" -> Map("inner" -> Map("deep" -> 9L)))
    assert(norm(Bson.decode(Bson.encode(v))) == norm(v))
    // int32 boundary values stay exact through the narrower encoding
    val edges = Map("a" -> Int.MaxValue.toLong, "b" -> Int.MinValue.toLong,
      "c" -> (Int.MaxValue.toLong + 1), "d" -> (Int.MinValue.toLong - 1))
    assert(Bson.decode(Bson.encode(edges)) == edges)
    // non-document top level fails closed like MongoDB
    intercept[InvalidCodecException](Bson.encode(Vector(1L)))
    intercept[InvalidCodecException](Bson.encode("str"))
  }

  test("bson: dispatches through Serialization") {
    val v = Map("k" -> Vector(1L, 2L), "s" -> "x")
    assert(Serialization.deserialize("bson", Serialization.serialize("bson", v)) == v)
  }

  test("json5: leniencies parse to the strict-JSON value model") {
    val j5 =
      """{ // config-style document
        |  unquoted: 1,
        |  'single': 'it''s not this', /* actually JSON5 has no '' escape */
        |  hex: 0xFF, negHex: -0x10, plus: +4,
        |  trailingDot: 2., leadingDot: .5,
        |  inf: Infinity, ninf: -Infinity,
        |  arr: [1, 2, 3,],
        |  esc: "a\
        |b\x41é",
        |}""".stripMargin.replace("it''s not this", "it\\'s ok")
    val m = Json5.parse(j5).asInstanceOf[Map[String, Any]]
    assert(m("unquoted") == 1L)
    assert(m("single") == "it's ok")
    assert(m("hex") == 255L && m("negHex") == -16L && m("plus") == 4L)
    assert(m("trailingDot") == 2.0 && m("leadingDot") == 0.5)
    assert(m("inf") == Double.PositiveInfinity && m("ninf") == Double.NegativeInfinity)
    assert(m("arr") == Vector(1L, 2L, 3L))
    assert(m("esc") == "abAé")
    assert(Json5.parse("{a:NaN}").asInstanceOf[Map[String, Any]]("a")
      .asInstanceOf[Double].isNaN)
    // strict JSON is a subset
    assert(Json5.parse("""{"a": [1, 2.5, true, null]}""") ==
      Map("a" -> Vector(1L, 2.5, true, null)))
    // and the serializer side is plain JSON, so every emit reparses
    val v = Map("a" -> Vector(1L, "x"), "b" -> 2.5)
    assert(Serialization.deserialize("json5", Serialization.serialize("json5", v)) == v)
  }

  test("json/json5: literals are validated, not width-skipped") {
    // "tree"/"nope" must error, not silently parse as true/null
    intercept[Exception](Json5.parse("[tree]"))
    intercept[Exception](Json5.parse("[nope]"))
    intercept[Exception](Json5.parse("[fals]"))
    intercept[Exception](Serialization.deserialize("json", "[tree]".getBytes("UTF-8")))
    assert(Json5.parse("[true, false, null]") == Vector(true, false, null))
    assert(Serialization.deserialize("json", "[true,false,null]".getBytes("UTF-8")) ==
      Vector(true, false, null))
  }

  test("bson/json5 fail closed on truncated and corrupt input") {
    val good = Bson.encode(Map("a" -> 1L, "s" -> "hello", "b" -> Array[Byte](1, 2, 3)))
    // every truncation point raises the typed codec error, never a raw
    // ArrayIndexOutOfBounds / NegativeArraySize leak
    (0 until good.length).foreach { n =>
      intercept[InvalidCodecException](Bson.decode(good.take(n)))
    }
    // corrupt declared lengths: document length beyond the buffer, string
    // length beyond the buffer, negative binary length
    val longDoc = good.clone(); longDoc(0) = 127; longDoc(1) = 0
    intercept[InvalidCodecException](Bson.decode(longDoc))
    val zeroStr = good.clone()
    val strLenOff = good.indexOfSlice("hello".getBytes("UTF-8")) - 4
    zeroStr(strLenOff) = 100
    intercept[InvalidCodecException](Bson.decode(zeroStr))
    // json5: truncated string/number/comment all surface as InvalidCodec
    Seq("{a: 'unterminated", "[1, 2", "/* open comment", "[0x]", "{\"k\":", "[+]")
      .foreach { bad =>
        intercept[InvalidCodecException](Json5.parse(bad))
      }
  }

  test("bson nested-document length near Int.MaxValue fails closed (no Int wrap)") {
    // the EMPTY nested map is the vector that proved fail-OPEN pre-fix:
    // its next byte is the 0x00 terminator, so once `pos + total` wrapped
    // negative in Int arithmetic the body loop was skipped, the NUL check
    // passed, and the crafted document DECODED successfully. (A non-empty
    // nested doc would have tripped the NUL check by accident.)
    def corrupt(m: Map[String, Any]): Array[Byte] = {
      // nested document length sits after total(4) + type(1) + key "n"+NUL(2)
      val b = Bson.encode(m)
      b(7) = 0xFF.toByte; b(8) = 0xFF.toByte
      b(9) = 0xFF.toByte; b(10) = 0x7F.toByte
      b
    }
    intercept[InvalidCodecException](Bson.decode(corrupt(Map("n" -> Map.empty[String, Any]))))
    intercept[InvalidCodecException](Bson.decode(corrupt(Map("n" -> Map("a" -> 1L)))))
  }
}
