package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip law for every reversible encoding + compression format,
  * mirroring the reference's EncodeBufferRunner/CompressRunner
  * (/root/reference/src/test/common/EncodeToolsRunner.ts:132-193, 397-449),
  * with RFC 4648 known vectors as the oracle.
  */
class FunctionsSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  private def samples: Seq[Array[Byte]] =
    Seq(Array.emptyByteArray, "f".getBytes, "fo".getBytes, "foo".getBytes,
      "foob".getBytes, "fooba".getBytes, "foobar".getBytes,
      Array[Byte](0, 0, 0, 0), Array[Byte](-1, -2, -3)) ++
      (1 to 30).map(_ => Array.fill(rnd.nextInt(500))(rnd.nextInt().toByte))

  test("base32 RFC 4648 vectors") {
    assert(Encodings.base32("".getBytes) == "")
    assert(Encodings.base32("f".getBytes) == "MY======")
    assert(Encodings.base32("fo".getBytes) == "MZXQ====")
    assert(Encodings.base32("foo".getBytes) == "MZXW6===")
    assert(Encodings.base32("foob".getBytes) == "MZXW6YQ=")
    assert(Encodings.base32("fooba".getBytes) == "MZXW6YTB")
    assert(Encodings.base32("foobar".getBytes) == "MZXW6YTBOI======")
  }

  test("base64url RFC 4648 §5 (no padding, url-safe alphabet)") {
    val b = Array[Byte](-5, -16, 62, 63) // produces +/ chars in plain base64
    val e = Encodings.base64url(b)
    assert(!e.contains('+') && !e.contains('/') && !e.contains('='))
    assert(Encodings.unbase64url(e).sameElements(b))
  }

  test("ascii85 known vector") {
    // "Man " encodes to 9jqo^ in Adobe ascii85
    assert(Encodings.ascii85("Man ".getBytes) == "9jqo^")
    assert(new String(Encodings.unascii85("9jqo^")) == "Man ")
    // all-zero group shortcut
    assert(Encodings.ascii85(Array[Byte](0, 0, 0, 0)) == "z")
  }

  for (fmt <- Seq("base64", "base64url", "hex", "base32", "ascii85")) {
    test(s"$fmt round-trips random buffers") {
      samples.foreach { b =>
        val enc = Encodings.dispatchEncode(fmt, b)
        val dec = Encodings.dispatchDecode(fmt, enc)
        assert(dec.sameElements(b), s"$fmt failed on ${b.length} bytes")
      }
    }
  }

  test("unknown encoding fails closed") {
    intercept[InvalidCodecException](Encodings.dispatchEncode("rot13", Array[Byte](1)))
  }

  for (fmt <- Seq("zstd", "lzma"); level <- Seq(1, 3, 9)) {
    test(s"$fmt level $level round-trips") {
      samples.filter(_.nonEmpty).foreach { b =>
        val c = Compression.dispatchCompress(fmt, b, level)
        assert(Compression.dispatchDecompress(fmt, c).sameElements(b))
      }
    }
  }

  test("compression actually compresses repetitive data") {
    val b = ("spark " * 1000).getBytes
    assert(Compression.zstdCompress(b, 3).length < b.length / 10)
    assert(Compression.lzmaCompress(b, 6).length < b.length / 10)
  }

  test("id generation: shape + uniqueness") {
    val uuids = (1 to 1000).map(_ => IdGen.uuidv4String)
    assert(uuids.distinct.size == 1000)
    assert(uuids.forall(_.length == 36))
    val nids = (1 to 1000).map(_ => IdGen.nanoid())
    assert(nids.distinct.size == 1000)
    assert(nids.forall(_.length == 21))
    assert(IdGen.objectId.length == 12)
    val slug = IdGen.encodeSlug(IdGen.uuidv4)
    assert(slug.length == 22)
    assert(IdGen.decodeSlug(slug).length == 16)
  }
}
