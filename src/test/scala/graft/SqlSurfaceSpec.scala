package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registered Spark SQL surface: every reference codec family reachable
  * from `spark.sql(...)` by name (GraftFunctions.registerAll).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftFunctions.registerAll(s)
    s
  }

  private def one(sql: String): Any = spark.sql(sql).head().get(0)

  test("binary encodings dispatch from SQL") {
    assert(one("SELECT graft_encode('base32', encode('foobar', 'UTF-8'))") ==
      "MZXW6YTBOI======")
    assert(one("SELECT graft_encode('ascii85', encode('Man ', 'UTF-8'))") == "9jqo^")
    assert(one(
      "SELECT decode(graft_decode('base64', graft_encode('base64', encode('héllo', 'UTF-8'))), 'UTF-8')")
      == "héllo")
    intercept[Exception](spark.sql("SELECT graft_encode('rot13', encode('x', 'UTF-8'))").head())
  }

  test("hash dispatch from SQL") {
    assert(one("SELECT graft_hash('sha1', encode('abc', 'UTF-8'))") ==
      "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(one("SELECT graft_hash('xxhash64', encode('abc', 'UTF-8'))") ==
      "1423657621850124518")
  }

  test("compression dispatch from SQL round-trips") {
    assert(one(
      """SELECT decode(graft_decompress('zstd',
        |  graft_compress('zstd', encode('compress me please', 'UTF-8'), 3)), 'UTF-8')"""
        .stripMargin) == "compress me please")
    assert(one(
      """SELECT decode(graft_decompress('lzma',
        |  graft_compress('lzma', encode('compress me please', 'UTF-8'), 6)), 'UTF-8')"""
        .stripMargin) == "compress me please")
  }

  test("serialization round-trip probe from SQL") {
    Seq("json", "msgpack", "cbor").foreach { fmt =>
      assert(one(s"""SELECT graft_serialize_roundtrip('$fmt', '{"a":1,"b":[true,null]}')""") ==
        """{"a":1,"b":[true,null]}""", fmt)
    }
  }

  test("hashids + negotiation + minting from SQL") {
    assert(one("SELECT graft_hashid_decode('s', graft_hashid_encode('s', 12345))") == 12345L)
    assert(one("SELECT graft_negotiate('application/JSON; charset=utf-8', 'cbor')") == "json")
    assert(one("SELECT graft_negotiate('text/weird', 'cbor')") == "cbor")
    assert(one("SELECT length(graft_mint('uuidv4String'))") == 36)
    assert(one("SELECT canonical_xxh64(array(1, 2, 3))") == -2639016923902991239L)
  }
}
