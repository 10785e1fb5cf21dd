package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Validates the engine's XXH64 against Spark's built-in `xxhash64`
  * expression (seed 42) — the analog of the reference checking every hash
  * against hash-wasm directly
  * (/root/reference/src/test/src/EncodeTools.ts:519-543).
  */
class ChecksumSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("XXH64 matches Spark's xxhash64 expression on binary input") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val samples: Seq[Array[Byte]] =
      Seq(Array.emptyByteArray, Array[Byte](1), "hello world".getBytes) ++
        (1 to 50).map(_ => Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte))
    val df = samples.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "b")
    val got = df.select($"i", xxhash64($"b").as("h")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    samples.zipWithIndex.foreach { case (b, i) =>
      assert(Checksum.xxh64(b) == got(i), s"sample $i len ${b.length}")
    }
  }

  test("known vectors (XXH64 spec, seed 0)") {
    // standard sanity vector: xxh64("" , seed=0) = 0xEF46DB3751D8E999
    assert(Checksum.xxh64(Array.emptyByteArray, 0L) == 0xEF46DB3751D8E999L)
  }

  test("known vectors (XXH32 spec)") {
    // canonical vectors from the xxHash reference implementation
    assert(Checksum.xxh32(Array.emptyByteArray, 0) == 0x02CC5D05)
    assert(Checksum.xxh32("Hello World".getBytes("UTF-8"), 0) == 0xB1FD16EE)
  }

  test("canonical block bytes layout") {
    val b = Checksum.canonicalBlockBytes(Seq(Array(1, 2), Array.empty[Int], Array(3)))
    // [2][1][2] [0] [1][3] as LE int32
    assert(b.length == 4 * 6)
    assert(Bits.readIntLE(b, 0) == 2)
    assert(Bits.readIntLE(b, 4) == 1)
    assert(Bits.readIntLE(b, 8) == 2)
    assert(Bits.readIntLE(b, 12) == 0)
    assert(Bits.readIntLE(b, 16) == 1)
    assert(Bits.readIntLE(b, 20) == 3)
  }

  test("streaming int-stream XXH64 equals byte-layout XXH64") {
    for (_ <- 1 to 100) {
      val rows = (0 to rnd.nextInt(5)).map(_ =>
        Array.fill(rnd.nextInt(200))(rnd.nextInt())).toArray
      val viaBytes = Checksum.blockChecksum(rows)
      val viaStream = Checksum.blockChecksumFlat(rows.map(_.length), rows.flatten)
      assert(viaBytes == viaStream)
    }
    // edge: empty block, empty rows
    assert(Checksum.blockChecksumFlat(Array.empty, Array.empty) ==
      Checksum.blockChecksum(Seq.empty))
    assert(Checksum.blockChecksumFlat(Array(0, 0), Array.empty) ==
      Checksum.blockChecksum(Seq(Array.empty[Int], Array.empty[Int])))
  }

  test("CanonicalXxh64 expression (codegen) matches the kernel hash") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val data = (1 to 50).map(i =>
      (i, Array.fill(rnd.nextInt(100))(rnd.nextInt(50257)))) :+
      ((51, Array.empty[Int]))
    val df = data.toDF("i", "tokens")
    val got = df.selectExpr("i", "canonical_xxh64(tokens) as h").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    data.foreach { case (i, toks) =>
      val want = Checksum.xxh64(Checksum.canonicalBlockBytes(Seq(toks)))
      assert(got(i) == want, s"row $i")
    }
  }

  test("block checksum is partition/retry independent (pure function of rows)") {
    val rows = Fixtures.localRows(50).map(_.tokens)
    val a = Checksum.blockChecksum(rows)
    val b = Checksum.blockChecksum(rows.map(_.clone()))
    assert(a == b)
  }

  test("Hashing dispatch agrees with independent implementations per algorithm") {
    val rng = new scala.util.Random(21)
    (1 to 30).foreach { _ =>
      val data = Array.fill(rng.nextInt(200) + 1)(rng.nextInt().toByte)
      assert(Hashing.hashString("md5", data) ==
        Encodings.hex(java.security.MessageDigest.getInstance("MD5").digest(data)))
      val crc = new java.util.zip.CRC32(); crc.update(data)
      assert(Hashing.hashString("crc32", data) == crc.getValue.toString)
      assert(Hashing.hashString("xxhash64", data) == Checksum.xxh64(data).toString)
      assert(Hashing.hashString("xxhash32", data) == Checksum.xxh32(data).toString)
    }
    // fixed published vectors
    assert(Hashing.hashString("sha1", "abc".getBytes("UTF-8")) ==
      "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(Hashing.hashString("sha256", "abc".getBytes("UTF-8")) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    intercept[InvalidCodecException](Hashing.hashString("bcrypt", Array[Byte](1)))
    intercept[InvalidCodecException](Hashing.hashString("xxhash3", Array[Byte](1)))
  }
}
