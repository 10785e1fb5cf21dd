package graft

import org.scalatest.funsuite.AnyFunSuite

class IdSpec extends AnyFunSuite {

  // ---- hashids: public vectors from the hashids.org documentation ----

  test("hashids public vectors (salt 'this is my salt')") {
    val h = new Hashids("this is my salt")
    assert(h.encode(12345L) == "NkK9")
    assert(h.decode("NkK9") == Seq(12345L))
    assert(h.encode(683L, 94108L, 123L, 5L) == "aBMswoO2UB3Sj")
    assert(h.decode("aBMswoO2UB3Sj") == Seq(683L, 94108L, 123L, 5L))
  }

  test("hashids: different salt -> different ids, foreign hash decodes empty") {
    val a = new Hashids("salt A")
    val b = new Hashids("salt B")
    assert(a.encode(99L) != b.encode(99L))
    assert(b.decode(a.encode(99L)).isEmpty, "cross-salt decode must fail closed")
    // malformed inputs NEVER throw: chars outside the alphabet, overflowing
    // chunks, lottery-only strings, empty input
    assert(a.decode("abc!def").isEmpty)
    assert(a.decode("!!!").isEmpty)
    assert(a.decode("zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz").isEmpty)
    assert(a.decode("Q").isEmpty)
    assert(a.decode("").isEmpty)
  }

  test("hashids: minLength padding preserves decodability") {
    val h = new Hashids("this is my salt", 16)
    (0L to 200L).foreach { n =>
      val e = h.encode(n)
      assert(e.length >= 16)
      assert(h.decode(e) == Seq(n), s"n=$n -> $e")
    }
  }

  test("hashids: hex round trip") {
    val h = new Hashids("graft")
    val hexes = Seq("deadbeef", "1", "abcdef0123456789abcdef")
    hexes.foreach { x =>
      assert(h.decodeHex(h.encodeHex(x)) == x)
    }
  }

  test("hashids: round-trip across many values and list sizes") {
    val h = new Hashids("round trip salt", 4)
    val rng = new scala.util.Random(13)
    (1 to 200).foreach { _ =>
      val nums = Seq.fill(1 + rng.nextInt(4))(rng.nextLong().abs % 1000000007L)
      assert(h.decode(h.encode(nums: _*)) == nums)
    }
  }

  // ---- uuidv1 ----

  test("uuidv1 has version 1, RFC variant, and is time-ordered") {
    val us = (1 to 500).map(_ => IdGen.uuidv1)
    us.foreach { u =>
      assert(u.version() == 1)
      assert(u.variant() == 2, "RFC 4122 variant")
    }
    val strs = us.map(_.toString)
    assert(strs.distinct.size == strs.size)
    // timestamp() of consecutive v1 uuids is strictly increasing in this JVM
    val ts = us.map(_.timestamp())
    assert(ts == ts.sorted && ts.distinct.size == ts.size)
  }

  test("uuidv1 timestamp decodes to now (within tolerance)") {
    val u = IdGen.uuidv1
    // UUID.timestamp() returns 100ns ticks since 1582-10-15
    val ms = (u.timestamp() - 122192928000000000L) / 10000L
    assert(math.abs(ms - System.currentTimeMillis()) < 10000)
  }

  // ---- slug law (reference EncodeTools.ts:1127-1138) ----

  test("slug of 16 raw uuid bytes is 22 chars and decode∘encode is identity") {
    (1 to 100).foreach { _ =>
      val bytes = IdGen.uuidv4
      val slug = IdGen.encodeSlug(bytes)
      assert(slug.length == 22)
      assert(java.util.Arrays.equals(IdGen.decodeSlug(slug), bytes))
    }
    intercept[IllegalArgumentException](IdGen.encodeSlug(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](IdGen.decodeSlug("AAAA"))
  }

  // ---- content negotiation (reference headerToConvertableFormat) ----

  test("content negotiation parses, strips params, folds case, falls back") {
    import ContentNegotiation._
    assert(parseContentType("application/JSON; charset=utf-8") == Some("application/json"))
    assert(parseContentType("") == None)
    assert(mimeToFormat("application/msgpack") == Some("msgpack"))
    assert(mimeToFormat("image/jpeg") == Some("jpeg"))
    assert(mimeToFormat("application/x-who-knows") == None)
    val h = Map("Content-Type" -> "application/cbor; q=1")
    assert(headerToFormat(h, "content-type") == Some("cbor"))
    assert(headerToFormat(Map.empty, "content-type", Some("json")) == Some("json"))
    assert(headerToFormat(Map("content-type" -> "text/odd"), "content-type",
      Some("json")) == Some("json"))
  }

  test("serialization mime map inverts (the reference's map-inversion test)") {
    ContentNegotiation.SerializationFormatMimeTypes.foreach { case (f, m) =>
      assert(ContentNegotiation.mimeToFormat(m) == Some(f))
    }
    // combined map + inverse (ConvertableFormatMimeTypes law)
    ContentNegotiation.ConvertableFormatMimeTypes.foreach { case (f, m) =>
      if (f != "jpeg" || true) // jpeg/msgpack share no mimes; all invertible except aliases
        assert(ContentNegotiation.MimeTypesConvertableFormat.get(m).nonEmpty)
    }
  }

  test("family-restricted negotiation rejects cross-family mimes") {
    import ContentNegotiation._
    val ser = Map("content-type" -> "application/msgpack")
    val img = Map("content-type" -> "image/png")
    assert(headerToSerializationFormat(ser, "content-type") == Some("msgpack"))
    assert(headerToSerializationFormat(img, "content-type", Some("json")) == Some("json"))
    assert(headerToImageFormat(img, "content-type") == Some("png"))
    assert(headerToImageFormat(ser, "content-type", Some("png")) == Some("png"))
    assert(headerToImageFormat(ser, "content-type") == None)
  }

  test("IdGen.mint dispatches every IDFormat, fails closed on unknown") {
    assert(IdGen.mint("uuidv4").length == 32)        // 16 bytes hex
    assert(IdGen.mint("uuidv4String").length == 36)
    assert(IdGen.mint("uuidv1").length == 32)
    assert(IdGen.mint("uuidv1String").length == 36)
    assert(java.util.UUID.fromString(IdGen.mint("uuidv1String")).version() == 1)
    assert(IdGen.mint("objectId").length == 24)
    assert(IdGen.mint("nanoid").length == 21)
    assert(IdGen.mint("timestamp").forall(_.isDigit))
    assert(IdGen.mint("slug").length == 22)
    intercept[InvalidCodecException](IdGen.mint("snowflake"))
  }
}
