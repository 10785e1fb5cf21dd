package graft

/** XXH64 checksum + the canonical byte layout of a token block.
  *
  * The reference canonicalizes objects before hashing (`hashObject`'s
  * ObjSorter pass, /root/reference/src/EncodeTools.ts:1039-1047) so
  * logically-equal inputs hash equal. The engine's analog is a fixed
  * little-endian layout of each block — `[n_tok:int32][tokens:int32...]` per
  * row in doc_id order — so checksums are independent of platform,
  * partition count, and task retry.
  *
  * The digest is standard XXH64 (Yann Collet's spec), the same algorithm
  * behind the reference's default `HashAlgorithm.xxhash64`
  * (/root/reference/src/EncodeTools.ts:907-909) and behind Spark's built-in
  * `xxhash64` expression, with Spark's default seed 42 so SQL-level spot
  * checks cross-validate engine checksums (verified in ChecksumSpec).
  */
object Checksum {
  final val Seed = 42L

  private final val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
  private final val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
  private final val P3 = 1609587929392839161L // 0x165667B19E3779F9
  private final val P4 = -8796714831421723037L // 0x85EBCA77C2B2AE63
  private final val P5 = 2870177450012600261L // 0x27D4EB2F165667C5

  private def readLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  private def readIntLE(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) |
      ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)

  def xxh64(data: Array[Byte], seed: Long = Seed): Long =
    xxh64(data, 0, data.length, seed)

  def xxh64(data: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    val end = off + len
    var h: Long = 0L
    var i = off
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = end - 32
      while (i <= limit) {
        v1 = java.lang.Long.rotateLeft(v1 + readLongLE(data, i) * P2, 31) * P1
        v2 = java.lang.Long.rotateLeft(v2 + readLongLE(data, i + 8) * P2, 31) * P1
        v3 = java.lang.Long.rotateLeft(v3 + readLongLE(data, i + 16) * P2, 31) * P1
        v4 = java.lang.Long.rotateLeft(v4 + readLongLE(data, i + 24) * P2, 31) * P1
        i += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      h = (h ^ java.lang.Long.rotateLeft(v1 * P2, 31) * P1) * P1 + P4
      h = (h ^ java.lang.Long.rotateLeft(v2 * P2, 31) * P1) * P1 + P4
      h = (h ^ java.lang.Long.rotateLeft(v3 * P2, 31) * P1) * P1 + P4
      h = (h ^ java.lang.Long.rotateLeft(v4 * P2, 31) * P1) * P1 + P4
    } else {
      h = seed + P5
    }
    h += len
    while (i + 8 <= end) {
      h ^= java.lang.Long.rotateLeft(readLongLE(data, i) * P2, 31) * P1
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= end) {
      h ^= (readIntLE(data, i) & 0xffffffffL) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h ^= (data(i) & 0xffL) * P5
      h = java.lang.Long.rotateLeft(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  // XXH32 (reference HashAlgorithm.xxhash32, EncodeTools.ts:896-898) —
  // standard spec, for parity with the reference's 32-bit digest family.
  private final val Q1 = -1640531535 // 0x9E3779B1
  private final val Q2 = -2048144777 // 0x85EBCA77
  private final val Q3 = -1028477379 // 0xC2B2AE3D
  private final val Q4 = 668265263 // 0x27D4EB2F
  private final val Q5 = 374761393 // 0x165667B1

  def xxh32(data: Array[Byte], seed: Int = 0): Int = {
    val len = data.length
    var i = 0
    var h = 0
    if (len >= 16) {
      var v1 = seed + Q1 + Q2
      var v2 = seed + Q2
      var v3 = seed
      var v4 = seed - Q1
      val limit = len - 16
      while (i <= limit) {
        v1 = Integer.rotateLeft(v1 + readIntLE(data, i) * Q2, 13) * Q1
        v2 = Integer.rotateLeft(v2 + readIntLE(data, i + 4) * Q2, 13) * Q1
        v3 = Integer.rotateLeft(v3 + readIntLE(data, i + 8) * Q2, 13) * Q1
        v4 = Integer.rotateLeft(v4 + readIntLE(data, i + 12) * Q2, 13) * Q1
        i += 16
      }
      h = Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
        Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
    } else {
      h = seed + Q5
    }
    h += len
    while (i + 4 <= len) {
      h += readIntLE(data, i) * Q3
      h = Integer.rotateLeft(h, 17) * Q4
      i += 4
    }
    while (i < len) {
      h += (data(i) & 0xff) * Q5
      h = Integer.rotateLeft(h, 11) * Q1
      i += 1
    }
    h ^= h >>> 15
    h *= Q2
    h ^= h >>> 13
    h *= Q3
    h ^= h >>> 16
    h
  }

  /** Streaming XXH64 over a stream of little-endian int32 values — hashes
    * the same byte stream as [[xxh64]] over the ints' LE bytes, with zero
    * allocation (the canonical token layout is int-aligned by
    * construction, so blocks/rows can be hashed without materializing the
    * canonical byte array).
    */
  final class Xxh64IntStream(seed: Long = Seed) {
    private var v1 = seed + P1 + P2
    private var v2 = seed + P2
    private var v3 = seed
    private var v4 = seed - P1
    private val buf = new Array[Int](8) // one 32-byte stripe
    private var fill = 0
    private var totalBytes = 0L
    private var anyStripe = false

    def update(v: Int): Unit = {
      buf(fill) = v
      fill += 1
      totalBytes += 4
      if (fill == 8) {
        v1 = java.lang.Long.rotateLeft(v1 + pair(0) * P2, 31) * P1
        v2 = java.lang.Long.rotateLeft(v2 + pair(2) * P2, 31) * P1
        v3 = java.lang.Long.rotateLeft(v3 + pair(4) * P2, 31) * P1
        v4 = java.lang.Long.rotateLeft(v4 + pair(6) * P2, 31) * P1
        fill = 0
        anyStripe = true
      }
    }

    private def pair(i: Int): Long =
      (buf(i) & 0xffffffffL) | (buf(i + 1).toLong << 32)

    def digest(): Long = {
      var h =
        if (anyStripe)
          java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
            java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
        else seed + P5
      if (anyStripe) {
        h = (h ^ java.lang.Long.rotateLeft(v1 * P2, 31) * P1) * P1 + P4
        h = (h ^ java.lang.Long.rotateLeft(v2 * P2, 31) * P1) * P1 + P4
        h = (h ^ java.lang.Long.rotateLeft(v3 * P2, 31) * P1) * P1 + P4
        h = (h ^ java.lang.Long.rotateLeft(v4 * P2, 31) * P1) * P1 + P4
      }
      h += totalBytes
      var i = 0
      while (i + 2 <= fill) {
        h ^= java.lang.Long.rotateLeft(pair(i) * P2, 31) * P1
        h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
        i += 2
      }
      if (i < fill) {
        h ^= (buf(i) & 0xffffffffL) * P1
        h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      }
      h ^= h >>> 33
      h *= P2
      h ^= h >>> 29
      h *= P3
      h ^= h >>> 32
      h
    }
  }

  /** Canonical-layout hash of one token row, allocation-free. */
  def rowHash(tokens: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val st = new Xxh64IntStream()
    val n = tokens.numElements()
    st.update(n)
    var i = 0
    while (i < n) { st.update(tokens.getInt(i)); i += 1 }
    st.digest()
  }

  /** Canonical bytes of one row: [n_tok int32 LE][tokens int32 LE ...]. */
  def canonicalRowSize(nTok: Int): Int = 4 + 4 * nTok

  /** Canonical bytes of a block of rows (token arrays in row order). */
  def canonicalBlockBytes(tokenArrays: Iterable[Array[Int]]): Array[Byte] = {
    var total = 0
    tokenArrays.foreach(a => total += canonicalRowSize(a.length))
    val out = new Array[Byte](total)
    var pos = 0
    tokenArrays.foreach { a =>
      Bits.writeIntLE(out, pos, a.length); pos += 4
      var i = 0
      while (i < a.length) { Bits.writeIntLE(out, pos, a(i)); pos += 4; i += 1 }
    }
    out
  }

  /** Streaming-free convenience: checksum of a block's canonical bytes. */
  def blockChecksum(tokenArrays: Iterable[Array[Int]]): Long =
    xxh64(canonicalBlockBytes(tokenArrays))

  /** Allocation-free equivalent of [[blockChecksum]] over the flattened
    * token stream + per-row lengths (asserted equal in ChecksumSpec).
    */
  def blockChecksumFlat(nToks: Array[Int], flat: Array[Int]): Long = {
    val st = new Xxh64IntStream()
    var pos = 0
    var r = 0
    while (r < nToks.length) {
      val n = nToks(r)
      st.update(n)
      var i = 0
      while (i < n) { st.update(flat(pos + i)); i += 1 }
      pos += n
      r += 1
    }
    st.digest()
  }

  /** Sub-block integrity granule for sliced range reads: the block checksum
    * needs the FULL token stream, so a sliced decode used to return
    * unverified tokens. Per-interval digests close that gap — a slice is
    * extended to interval boundaries (≤ 2 x 4 Ki extra tokens), each covered
    * interval verified, then trimmed.
    */
  val SliceDigestInterval = 4096

  /** XXH64 of one flat-stream range (no row structure — pure token-stream
    * integrity, independent of row boundaries).
    */
  def digestRange(flat: Array[Int], off: Int, len: Int): Long = {
    val st = new Xxh64IntStream()
    var i = 0
    while (i < len) { st.update(flat(off + i)); i += 1 }
    st.digest()
  }

  /** One digest per [[SliceDigestInterval]]-token interval of the block's
    * flat stream (last interval may be short). ~8 bytes per 16 KiB of raw
    * tokens — negligible next to the payload.
    */
  def sliceDigests(flat: Array[Int]): Array[Long] = {
    val I = SliceDigestInterval
    val n = flat.length
    val out = new Array[Long]((n + I - 1) / I)
    var iv = 0
    var off = 0
    while (off < n) {
      val len = math.min(I, n - off)
      out(iv) = digestRange(flat, off, len)
      iv += 1
      off += len
    }
    out
  }
}

/** One hash dispatcher across the whole implemented algorithm family — the
  * analog of the reference's `hash`/`hashString` enum dispatch
  * (/root/reference/src/EncodeTools.ts:883-956, HashAlgorithm at :122-158).
  * Unknown algorithms fail closed like the reference's InvalidFormat.
  * bcrypt stays out of scope (password KDF, not a data digest — SURVEY §2.2);
  * xxhash3 has no JVM implementation in this sandbox's jars.
  */
object Hashing {
  val Algorithms: Seq[String] =
    Seq("crc32", "md5", "sha1", "sha256", "sha512", "sha3", "xxhash32", "xxhash64")

  /** Digest as the reference's hashString: hex for cryptographic digests,
    * decimal string for the integer checksums (crc32/xxhash), matching the
    * reference's number-or-buffer duality.
    */
  def hashString(algo: String, data: Array[Byte]): String = algo match {
    case "crc32" =>
      val c = new java.util.zip.CRC32(); c.update(data); c.getValue.toString
    case "md5" => Encodings.hex(java.security.MessageDigest.getInstance("MD5").digest(data))
    case "sha1" => Encodings.hex(java.security.MessageDigest.getInstance("SHA-1").digest(data))
    case "sha256" => Encodings.hex(java.security.MessageDigest.getInstance("SHA-256").digest(data))
    case "sha512" => Encodings.hex(java.security.MessageDigest.getInstance("SHA-512").digest(data))
    case "sha3" => Encodings.hex(java.security.MessageDigest.getInstance("SHA3-512").digest(data))
    case "xxhash32" => Checksum.xxh32(data).toString
    case "xxhash64" => Checksum.xxh64(data).toString
    case other => throw new InvalidCodecException(s"unknown hash algorithm '$other'")
  }
}
