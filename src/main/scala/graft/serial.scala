package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Binary object serialization — the analog of the reference's msgpack and
  * cbor branches of `serializeObject`/`deserializeObject`
  * (/root/reference/src/EncodeTools.ts:1242-1248, 1282-1288). Brand-new
  * implementations written against the PUBLIC wire specs (msgpack spec at
  * msgpack.org, CBOR RFC 8949), not ports of the npm backends.
  *
  * Value model (the JSON-ish subset both formats share and the reference
  * round-trips in its tests): null, Boolean, Long/Int (stored canonically
  * as Long), Double, String, Array[Byte], Seq[Any], Map[String, Any].
  */
object MsgPack {

  def pack(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(out, v)
    out.toByteArray
  }

  private def write(o: ByteArrayOutputStream, v: Any): Unit = v match {
    case null => o.write(0xc0)
    case b: Boolean => o.write(if (b) 0xc3 else 0xc2)
    case i: Int => writeLong(o, i.toLong)
    case l: Long => writeLong(o, l)
    case s: Short => writeLong(o, s.toLong)
    case b: Byte => writeLong(o, b.toLong)
    case d: Double =>
      o.write(0xcb); writeBE(o, java.lang.Double.doubleToLongBits(d), 8)
    case f: Float =>
      o.write(0xca); writeBE(o, java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL, 4)
    case s: String =>
      val b = s.getBytes(UTF_8)
      if (b.length < 32) o.write(0xa0 | b.length)
      else if (b.length < 256) { o.write(0xd9); o.write(b.length) }
      else if (b.length < 65536) { o.write(0xda); writeBE(o, b.length.toLong, 2) }
      else { o.write(0xdb); writeBE(o, b.length.toLong, 4) }
      o.write(b, 0, b.length)
    case b: Array[Byte] =>
      if (b.length < 256) { o.write(0xc4); o.write(b.length) }
      else if (b.length < 65536) { o.write(0xc5); writeBE(o, b.length.toLong, 2) }
      else { o.write(0xc6); writeBE(o, b.length.toLong, 4) }
      o.write(b, 0, b.length)
    case xs: Seq[_] =>
      if (xs.length < 16) o.write(0x90 | xs.length)
      else if (xs.length < 65536) { o.write(0xdc); writeBE(o, xs.length.toLong, 2) }
      else { o.write(0xdd); writeBE(o, xs.length.toLong, 4) }
      xs.foreach(write(o, _))
    case m: Map[_, _] =>
      if (m.size < 16) o.write(0x80 | m.size)
      else if (m.size < 65536) { o.write(0xde); writeBE(o, m.size.toLong, 2) }
      else { o.write(0xdf); writeBE(o, m.size.toLong, 4) }
      m.foreach { case (k, x) => write(o, k.toString); write(o, x) }
    case other =>
      throw new InvalidCodecException(s"msgpack: unsupported ${other.getClass}")
  }

  private def writeLong(o: ByteArrayOutputStream, l: Long): Unit = {
    if (l >= 0) {
      if (l < 128) o.write(l.toInt)
      else if (l < 256) { o.write(0xcc); o.write(l.toInt) }
      else if (l < 65536) { o.write(0xcd); writeBE(o, l, 2) }
      else if (l < (1L << 32)) { o.write(0xce); writeBE(o, l, 4) }
      else { o.write(0xcf); writeBE(o, l, 8) }
    } else {
      if (l >= -32) o.write(0xe0 | (l.toInt & 0x1f))
      else if (l >= Byte.MinValue) { o.write(0xd0); o.write(l.toInt & 0xff) }
      else if (l >= Short.MinValue) { o.write(0xd1); writeBE(o, l & 0xffffL, 2) }
      else if (l >= Int.MinValue) { o.write(0xd2); writeBE(o, l & 0xffffffffL, 4) }
      else { o.write(0xd3); writeBE(o, l, 8) }
    }
  }

  private def writeBE(o: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) { o.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  def unpack(b: Array[Byte]): Any = {
    val r = new Reader(b)
    val v = r.read()
    require(r.pos == b.length, s"msgpack: ${b.length - r.pos} trailing bytes")
    v
  }

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    private def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    private def be(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | u8(); i += 1 }
      v
    }
    private def str(n: Int): String = {
      val s = new String(b, pos, n, UTF_8); pos += n; s
    }
    private def bin(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
    private def arr(n: Int): Seq[Any] = Vector.fill(n)(read())
    private def map(n: Int): Map[String, Any] =
      Vector.fill(n)((read().toString, read())).toMap

    def read(): Any = {
      val t = u8()
      if (t < 0x80) t.toLong
      else if (t >= 0xe0) (t - 256).toLong
      else if ((t & 0xf0) == 0x80) map(t & 0x0f)
      else if ((t & 0xf0) == 0x90) arr(t & 0x0f)
      else if ((t & 0xe0) == 0xa0) str(t & 0x1f)
      else t match {
        case 0xc0 => null
        case 0xc2 => false
        case 0xc3 => true
        case 0xc4 => bin(u8())
        case 0xc5 => bin(be(2).toInt)
        case 0xc6 => bin(be(4).toInt)
        case 0xca => java.lang.Float.intBitsToFloat(be(4).toInt).toDouble
        case 0xcb => java.lang.Double.longBitsToDouble(be(8))
        case 0xcc => be(1)
        case 0xcd => be(2)
        case 0xce => be(4)
        case 0xcf => be(8) // uint64 > Long.MaxValue wraps; reference JS has same 2^53 caveat
        case 0xd0 => be(1).toByte.toLong
        case 0xd1 => be(2).toShort.toLong
        case 0xd2 => be(4).toInt.toLong
        case 0xd3 => be(8)
        case 0xd9 => str(u8())
        case 0xda => str(be(2).toInt)
        case 0xdb => str(be(4).toInt)
        case 0xdc => arr(be(2).toInt)
        case 0xdd => arr(be(4).toInt)
        case 0xde => map(be(2).toInt)
        case 0xdf => map(be(4).toInt)
        case other => throw new InvalidCodecException(f"msgpack: bad type 0x$other%02x")
      }
    }
  }
}

/** CBOR (RFC 8949) for the same value model. Canonical-ish encoding:
  * shortest-length integer heads, definite lengths only, float64 for all
  * floating-point (matching the reference backend's JS number handling).
  */
object Cbor {

  def encode(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(out, v)
    out.toByteArray
  }

  private def head(o: ByteArrayOutputStream, major: Int, n: Long): Unit = {
    val m = major << 5
    if (n < 24) o.write(m | n.toInt)
    else if (n < 256) { o.write(m | 24); o.write(n.toInt) }
    else if (n < 65536) { o.write(m | 25); writeBE(o, n, 2) }
    else if (n < (1L << 32)) { o.write(m | 26); writeBE(o, n, 4) }
    else { o.write(m | 27); writeBE(o, n, 8) }
  }

  private def writeBE(o: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) { o.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  private def write(o: ByteArrayOutputStream, v: Any): Unit = v match {
    case null => o.write(0xf6)
    case b: Boolean => o.write(if (b) 0xf5 else 0xf4)
    case i: Int => writeLong(o, i.toLong)
    case l: Long => writeLong(o, l)
    case s: Short => writeLong(o, s.toLong)
    case b: Byte => writeLong(o, b.toLong)
    case d: Double =>
      o.write(0xfb); writeBE(o, java.lang.Double.doubleToLongBits(d), 8)
    case f: Float =>
      o.write(0xfb); writeBE(o, java.lang.Double.doubleToLongBits(f.toDouble), 8)
    case s: String =>
      val b = s.getBytes(UTF_8); head(o, 3, b.length.toLong); o.write(b, 0, b.length)
    case b: Array[Byte] =>
      head(o, 2, b.length.toLong); o.write(b, 0, b.length)
    case xs: Seq[_] =>
      head(o, 4, xs.length.toLong); xs.foreach(write(o, _))
    case m: Map[_, _] =>
      head(o, 5, m.size.toLong)
      m.foreach { case (k, x) => write(o, k.toString); write(o, x) }
    case other =>
      throw new InvalidCodecException(s"cbor: unsupported ${other.getClass}")
  }

  private def writeLong(o: ByteArrayOutputStream, l: Long): Unit =
    if (l >= 0) head(o, 0, l) else head(o, 1, -1L - l)

  def decode(b: Array[Byte]): Any = {
    val r = new Reader(b)
    val v = r.read()
    require(r.pos == b.length, s"cbor: ${b.length - r.pos} trailing bytes")
    v
  }

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    private def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    private def be(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | u8(); i += 1 }
      v
    }
    private def len(info: Int): Long = info match {
      case i if i < 24 => i.toLong
      case 24 => be(1)
      case 25 => be(2)
      case 26 => be(4)
      case 27 => be(8)
      case other => throw new InvalidCodecException(s"cbor: indefinite/reserved $other")
    }

    def read(): Any = {
      val t = u8()
      val major = t >>> 5
      val info = t & 0x1f
      major match {
        case 0 => len(info)
        case 1 => -1L - len(info)
        case 2 =>
          val n = len(info).toInt
          val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
        case 3 =>
          val n = len(info).toInt
          val s = new String(b, pos, n, UTF_8); pos += n; s
        case 4 => Vector.fill(len(info).toInt)(read())
        case 5 => Vector.fill(len(info).toInt)((read().toString, read())).toMap
        case 7 => info match {
          case 20 => false
          case 21 => true
          case 22 => null
          case 25 => halfToDouble(be(2).toInt)
          case 26 => java.lang.Float.intBitsToFloat(be(4).toInt).toDouble
          case 27 => java.lang.Double.longBitsToDouble(be(8))
          case other => throw new InvalidCodecException(s"cbor: simple $other")
        }
        case other => throw new InvalidCodecException(s"cbor: major $other (tags unsupported)")
      }
    }

    /** IEEE 754 half-precision decode (RFC 8949 appendix D). */
    private def halfToDouble(h: Int): Double = {
      val exp = (h >> 10) & 0x1f
      val mant = h & 0x3ff
      val v =
        if (exp == 0) math.pow(2, -24) * mant
        else if (exp != 31) math.pow(2, exp - 25) * (mant + 1024)
        else if (mant == 0) Double.PositiveInfinity
        else Double.NaN
      if ((h & 0x8000) != 0) -v else v
    }
  }
}

/** BSON (bsonspec.org version 1.1) for the document-oriented subset of the
  * shared value model — the analog of the reference's `objectToBson`/
  * `bsonToObject` (/root/reference/src/EncodeTools.ts:1295-1301), written
  * from the public spec (NOT the npm bson backend). All lengths/integers
  * are LITTLE-endian (unlike msgpack/cbor). Top level must be a document
  * (Map), as in MongoDB. Element types used: 0x01 double, 0x02 string,
  * 0x03 embedded document, 0x04 array, 0x05 binary (subtype 0), 0x08
  * bool, 0x0A null, 0x10 int32, 0x12 int64. Longs encode as int32 when
  * they fit (what the JS bson serializer does for safe integers), int64
  * otherwise; both decode back to canonical Long.
  */
object Bson {

  def encode(v: Any): Array[Byte] = v match {
    case m: Map[_, _] =>
      document(m.asInstanceOf[Map[Any, Any]].map { case (k, x) => (k.toString, x) }.toSeq)
    case other =>
      throw new InvalidCodecException(
        s"bson: top level must be a document, got ${if (other == null) "null" else other.getClass}")
  }

  private def document(fields: Seq[(String, Any)]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    fields.foreach { case (k, v) => element(body, k, v) }
    val out = new ByteArrayOutputStream()
    writeLE(out, body.size() + 5L, 4) // int32 total length, incl. itself + trailing NUL
    body.writeTo(out)
    out.write(0x00)
    out.toByteArray
  }

  private def element(o: ByteArrayOutputStream, key: String, v: Any): Unit = {
    def name(t: Int): Unit = {
      o.write(t)
      val kb = key.getBytes(UTF_8)
      require(!kb.contains(0.toByte), "bson: key contains NUL")
      o.write(kb, 0, kb.length); o.write(0x00)
    }
    v match {
      case null => name(0x0a)
      case b: Boolean => name(0x08); o.write(if (b) 1 else 0)
      case d: Double => name(0x01); writeLE(o, java.lang.Double.doubleToLongBits(d), 8)
      case f: Float => name(0x01); writeLE(o, java.lang.Double.doubleToLongBits(f.toDouble), 8)
      case i: Int => intElem(o, name, i.toLong)
      case l: Long => intElem(o, name, l)
      case s: Short => intElem(o, name, s.toLong)
      case b: Byte => intElem(o, name, b.toLong)
      case s: String =>
        name(0x02)
        val sb = s.getBytes(UTF_8)
        writeLE(o, sb.length + 1L, 4); o.write(sb, 0, sb.length); o.write(0x00)
      case b: Array[Byte] =>
        name(0x05); writeLE(o, b.length.toLong, 4); o.write(0x00) // subtype 0: generic
        o.write(b, 0, b.length)
      case m: Map[_, _] =>
        name(0x03)
        val d = document(m.asInstanceOf[Map[Any, Any]]
          .map { case (k, x) => (k.toString, x) }.toSeq)
        o.write(d, 0, d.length)
      case xs: Seq[_] =>
        name(0x04) // array = document keyed "0", "1", ...
        val d = document(xs.zipWithIndex.map { case (x, i) => (i.toString, x) })
        o.write(d, 0, d.length)
      case other => throw new InvalidCodecException(s"bson: unsupported ${other.getClass}")
    }
  }

  private def intElem(o: ByteArrayOutputStream, name: Int => Unit, l: Long): Unit =
    if (l >= Int.MinValue && l <= Int.MaxValue) { name(0x10); writeLE(o, l & 0xffffffffL, 4) }
    else { name(0x12); writeLE(o, l, 8) }

  private def writeLE(o: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { o.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** Fail-closed like the rest of the Serialization dispatch: truncated or
    * corrupt input surfaces as InvalidCodecException with the byte offset,
    * never a raw ArrayIndexOutOfBounds/NumberFormat leak.
    */
  def decode(b: Array[Byte]): Any = {
    val r = new Reader(b)
    try {
      val v = r.document()
      require(r.pos == b.length, s"bson: ${b.length - r.pos} trailing bytes")
      v
    } catch {
      case e: InvalidCodecException => throw e
      case e: RuntimeException => throw new InvalidCodecException(
        s"bson: malformed input at offset ${r.pos}: ${e.getMessage}")
    }
  }

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    private def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    private def le(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v |= (u8().toLong << (8 * i)); i += 1 }
      v
    }
    private def cstring(): String = {
      val start = pos
      while (pos < b.length && b(pos) != 0) pos += 1
      if (pos >= b.length)
        throw new InvalidCodecException(s"bson: unterminated cstring at $start")
      val s = new String(b, start, pos - start, UTF_8); pos += 1; s
    }

    def document(): Map[String, Any] = fields().toMap

    private def fields(): Vector[(String, Any)] = {
      // length arithmetic in Long: a crafted total near Int.MaxValue at
      // pos>0 would wrap `pos + total` negative and slip past an Int
      // bounds check (decoding garbage as an empty document — fail-open)
      val total = le(4)
      val endL = pos.toLong + total - 5
      if (total < 5 || endL >= b.length || endL < pos)
        throw new InvalidCodecException(s"bson: bad document length $total at ${pos - 4}")
      val end = endL.toInt
      val out = Vector.newBuilder[(String, Any)]
      while (pos < end) out += element()
      require(u8() == 0, "bson: document not NUL-terminated")
      out.result()
    }

    private def element(): (String, Any) = {
      val t = u8()
      val key = cstring()
      val v: Any = t match {
        case 0x01 => java.lang.Double.longBitsToDouble(le(8))
        case 0x02 =>
          val n = le(4).toInt
          if (n < 1 || pos + n > b.length)
            throw new InvalidCodecException(s"bson: bad string length $n at ${pos - 4}")
          val s = new String(b, pos, n - 1, UTF_8); pos += n; s
        case 0x03 => document()
        case 0x04 => fields().map(_._2) // array: values in key order 0,1,...
        case 0x05 =>
          val n = le(4).toInt
          val sub = u8()
          require(sub == 0, s"bson: binary subtype $sub unsupported")
          if (n < 0 || pos + n > b.length)
            throw new InvalidCodecException(s"bson: bad binary length $n at ${pos - 5}")
          val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
        case 0x08 => u8() != 0
        case 0x0a => null
        case 0x10 => le(4).toInt.toLong
        case 0x12 => le(8)
        case other => throw new InvalidCodecException(f"bson: element type 0x$other%02x")
      }
      (key, v)
    }
  }
}

/** JSON5 decode leniency (json5.org spec) over the strict [[JsonValue]]
  * parser — the reference's `json5ToObject`
  * (/root/reference/src/EncodeTools.ts:1269-1275). Encode side is plain
  * JSON (every JSON document is valid JSON5), exactly like the reference's
  * `objectToJson5` delegating to JSON5.stringify whose output for the
  * value model is JSON. Supported leniencies: // and block comments,
  * trailing commas, unquoted ECMAScript identifier keys, single-quoted
  * strings, hex integers, leading '+', leading/trailing decimal point,
  * Infinity/NaN, escaped newlines in strings.
  */
object Json5 {
  /** Fail-closed: malformed JSON5 (truncated literal, bad escape, bad
    * number) surfaces as InvalidCodecException with the char offset.
    */
  def parse(s: String): Any = {
    val p = new P(s)
    try {
      val v = p.value()
      p.ws()
      require(p.pos == s.length, s"json5: trailing input at ${p.pos}")
      v
    } catch {
      case e: InvalidCodecException => throw e
      case e: RuntimeException => throw new InvalidCodecException(
        s"json5: malformed input at offset ${p.pos}: ${e.getMessage}")
    }
  }

  private final class P(s: String) {
    var pos = 0
    def ws(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (pos < s.length && s(pos).isWhitespace) { pos += 1; moved = true }
        if (pos + 1 < s.length && s(pos) == '/' && s(pos + 1) == '/') {
          while (pos < s.length && s(pos) != '\n') pos += 1
          moved = true
        } else if (pos + 1 < s.length && s(pos) == '/' && s(pos + 1) == '*') {
          pos += 2
          while (pos + 1 < s.length && !(s(pos) == '*' && s(pos + 1) == '/')) pos += 1
          require(pos + 1 < s.length, "json5: unterminated block comment")
          pos += 2
          moved = true
        }
      }
    }
    private def expect(c: Char): Unit = {
      require(pos < s.length && s(pos) == c, s"json5: expected '$c' at $pos")
      pos += 1
    }

    def value(): Any = {
      ws()
      s(pos) match {
        case '{' =>
          expect('{')
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
          ws()
          while (s(pos) != '}') {
            val k = key()
            ws(); expect(':')
            m(k) = value()
            ws()
            if (s(pos) == ',') { pos += 1; ws() } // trailing comma ok
            else require(s(pos) == '}', s"json5: expected ',' or '}' at $pos")
          }
          pos += 1
          m.toMap
        case '[' =>
          expect('[')
          val xs = Vector.newBuilder[Any]
          ws()
          while (s(pos) != ']') {
            xs += value()
            ws()
            if (s(pos) == ',') { pos += 1; ws() }
            else require(s(pos) == ']', s"json5: expected ',' or ']' at $pos")
          }
          pos += 1
          xs.result()
        case '"' | '\'' => string(s(pos))
        case 't' => literal("true"); true
        case 'f' => literal("false"); false
        case 'n' => literal("null"); null
        case _ => number()
      }
    }

    // validate the literal text — skipping a fixed width would silently
    // misparse e.g. "tree" as true
    private def literal(word: String): Unit = {
      require(s.regionMatches(pos, word, 0, word.length),
        s"json5: bad literal at $pos")
      pos += word.length
    }

    private def key(): String = {
      ws()
      if (s(pos) == '"' || s(pos) == '\'') string(s(pos))
      else { // unquoted ECMAScript IdentifierName ($, _, letters, then also digits)
        val start = pos
        require(s(pos) == '$' || s(pos) == '_' || s(pos).isLetter,
          s"json5: bad identifier key at $pos")
        while (pos < s.length &&
          (s(pos) == '$' || s(pos) == '_' || s(pos).isLetterOrDigit)) pos += 1
        s.substring(start, pos)
      }
    }

    private def number(): Any = {
      val start = pos
      var sign = 1L
      if (s(pos) == '+') pos += 1
      else if (s(pos) == '-') { sign = -1; pos += 1 }
      if (s.startsWith("Infinity", pos)) { pos += 8; return sign * Double.PositiveInfinity }
      if (s.startsWith("NaN", pos)) { pos += 3; return Double.NaN }
      if (pos + 1 < s.length && s(pos) == '0' && (s(pos + 1) == 'x' || s(pos + 1) == 'X')) {
        pos += 2
        val h0 = pos
        while (pos < s.length && Character.digit(s(pos), 16) >= 0) pos += 1
        return sign * java.lang.Long.parseLong(s.substring(h0, pos), 16)
      }
      while (pos < s.length && "0123456789.eE+-".indexOf(s(pos)) >= 0 &&
        !(("+-".indexOf(s(pos)) >= 0) && "eE".indexOf(s(pos - 1)) < 0)) pos += 1
      val t = s.substring(start, pos)
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) t.toDouble else t.toLong
    }

    private def string(q: Char): String = {
      expect(q)
      val sb = new StringBuilder
      while (s(pos) != q) {
        if (s(pos) == '\\') {
          pos += 1
          s(pos) match {
            case 'n' => sb.append('\n'); pos += 1
            case 'r' => sb.append('\r'); pos += 1
            case 't' => sb.append('\t'); pos += 1
            case 'b' => sb.append('\b'); pos += 1
            case 'f' => sb.append('\f'); pos += 1
            case 'v' => sb.append('\u000b'); pos += 1
            case '0' => sb.append('\u0000'); pos += 1
            case 'x' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 3), 16).toChar)
              pos += 3
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 5
            case '\n' => pos += 1 // line continuation
            case '\r' =>
              pos += 1; if (pos < s.length && s(pos) == '\n') pos += 1
            case c => sb.append(c); pos += 1
          }
        } else { sb.append(s(pos)); pos += 1 }
      }
      pos += 1
      sb.toString
    }
  }
}

/** Serialization dispatch across the reference's format family
  * (SerializationFormat, /root/reference/src/EncodeTools.ts:141-171):
  * json + msgpack + cbor + bson + json5 are full round-trip citizens.
  */
object Serialization {
  def serialize(format: String, v: Any): Array[Byte] = format match {
    case "json" => JsonValue.render(v).getBytes(UTF_8)
    case "json5" => JsonValue.render(v).getBytes(UTF_8) // JSON ⊂ JSON5
    case "msgpack" => MsgPack.pack(v)
    case "cbor" => Cbor.encode(v)
    case "bson" => Bson.encode(v)
    case f => throw new InvalidCodecException(s"unknown serialization format '$f'")
  }
  def deserialize(format: String, b: Array[Byte]): Any = format match {
    case "json" => JsonValue.parse(new String(b, UTF_8))
    case "json5" => Json5.parse(new String(b, UTF_8))
    case "msgpack" => MsgPack.unpack(b)
    case "cbor" => Cbor.decode(b)
    case "bson" => Bson.decode(b)
    case f => throw new InvalidCodecException(s"unknown serialization format '$f'")
  }
}

/** Minimal JSON render/parse for the shared value model (the reference's
  * json branch uses JSON.stringify/parse; Spark queries use to_json/from_json
  * — this exists so Serialization.dispatch round-trips all three formats
  * through one value model in tests).
  */
object JsonValue {
  def render(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case l: Long => l.toString
    case i: Int => i.toString
    case d: Double =>
      if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case s: String => quote(s)
    case b: Array[Byte] => quote(Encodings.base64(b)) // JSON has no bytes; reference uses base64
    case xs: Seq[_] => xs.map(render).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.map { case (k, x) => quote(k.toString) + ":" + render(x) }.mkString("{", ",", "}")
    case other => throw new InvalidCodecException(s"json: unsupported ${other.getClass}")
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.pos == s.length, s"json: trailing input at ${p.pos}")
    v
  }

  private final class P(s: String) {
    var pos = 0
    def ws(): Unit = while (pos < s.length && s(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(pos < s.length && s(pos) == c, s"json: expected '$c' at $pos")
      pos += 1
    }
    def value(): Any = {
      ws()
      s(pos) match {
        case '{' =>
          expect('{'); ws()
          if (s(pos) == '}') { pos += 1; Map.empty[String, Any] }
          else {
            val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
            var more = true
            while (more) {
              ws()
              val k = string()
              ws(); expect(':')
              m(k) = value()
              ws()
              if (s(pos) == ',') pos += 1 else { expect('}'); more = false }
            }
            m.toMap
          }
        case '[' =>
          expect('['); ws()
          if (s(pos) == ']') { pos += 1; Vector.empty[Any] }
          else {
            val xs = Vector.newBuilder[Any]
            var more = true
            while (more) {
              xs += value()
              ws()
              if (s(pos) == ',') pos += 1 else { expect(']'); more = false }
            }
            xs.result()
          }
        case '"' => string()
        case 't' => literal("true"); true
        case 'f' => literal("false"); false
        case 'n' => literal("null"); null
        case _ =>
          val start = pos
          while (pos < s.length && "+-0123456789.eE".indexOf(s(pos)) >= 0) pos += 1
          val t = s.substring(start, pos)
          if (t.exists(c => c == '.' || c == 'e' || c == 'E')) t.toDouble else t.toLong
      }
    }
    private def literal(word: String): Unit = {
      require(s.regionMatches(pos, word, 0, word.length),
        s"json: bad literal at $pos")
      pos += word.length
    }
    def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s(pos) != '"') {
        if (s(pos) == '\\') {
          pos += 1
          s(pos) match {
            case 'n' => sb.append('\n'); pos += 1
            case 'r' => sb.append('\r'); pos += 1
            case 't' => sb.append('\t'); pos += 1
            case 'b' => sb.append('\b'); pos += 1
            case 'f' => sb.append('\f'); pos += 1
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 5
            case c => sb.append(c); pos += 1
          }
        } else { sb.append(s(pos)); pos += 1 }
      }
      pos += 1
      sb.toString
    }
  }
}
