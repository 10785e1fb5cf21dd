package graft

import Bits._

/** A lightweight compression codec over one block's concatenated token
  * stream. The family is the Spark-native re-imagining of the reference's
  * paired encode/decode leaf functions behind one dispatch interface
  * (`encodeBuffer`/`decodeBuffer`, /root/reference/src/EncodeTools.ts:784-796,
  * 869-881): every codec is a pure reversible transform obeying
  * `decode(encode(x), x.length) == x` bit-identically — the reference's
  * round-trip law (/root/reference/src/test/common/EncodeToolsRunner.ts:103-129).
  */
trait TokenCodec extends Serializable {
  def id: Int
  def name: String

  /** Whether this codec can encode a block with these stats at all. */
  def applicable(s: BlockStats): Boolean = true

  /** Estimated encoded bytes, used by the cost model. Must be cheap. */
  def estimate(s: BlockStats): Long

  def encode(tokens: Array[Int]): Array[Byte]
  def decode(bytes: Array[Byte], n: Int): Array[Int]

  /** Decode ONLY tokens [from, until) of an n-token payload when the wire
    * layout supports random access (fixed-stride codecs); None means the
    * caller must decode fully (sequential codecs: rle, fsst). Powers
    * point/range lookups that touch O(result) tokens instead of O(block).
    */
  def decodeSlice(bytes: Array[Byte], n: Int, from: Int, until: Int): Option[Array[Int]] = None
}

/** Codecs whose encoding factors into (symbol table, body). The engine
  * stores the table in its own Parquet column and reuses a trained table
  * across consecutive blocks of one partition (SURVEY §7.3's deferred
  * table-level reuse): identical table bytes dictionary-deduplicate inside
  * Parquet row groups (stored once per run of blocks), while every block
  * row still carries its table — independently decodable, so pruned range
  * reads never need a second lookup. Training is also the dominant encode
  * CPU for fsst, so reuse buys throughput as well as ratio.
  */
trait TableCodec extends TokenCodec {
  type Table <: AnyRef

  def train(tokens: Array[Int]): Table
  def tableBytes(t: Table): Array[Byte]
  def tableFromBytes(b: Array[Byte]): Table

  /** Encode with an existing table; None when the table cannot express
    * this block (e.g. dictionary miss) — caller retrains.
    */
  def encodeWith(t: Table, tokens: Array[Int]): Option[Array[Byte]]
  def decodeWith(tableB: Array[Byte], body: Array[Byte], n: Int): Array[Int]

  /** Slice variant of decodeWith; None when the body is sequential. */
  def decodeWithSlice(tableB: Array[Byte], body: Array[Byte], n: Int,
                      from: Int, until: Int): Option[Array[Int]] = None

  /** Quick should-we-retrain heuristic given the cached table and the new
    * block's stats (avoids paying a doomed encodeWith attempt).
    */
  def reusable(t: Table, s: BlockStats): Boolean
}

/** Verbatim little-endian int32 — the identity codec, analog of
  * `BinaryEncoding.nodeBuffer` (/root/reference/src/EncodeTools.ts:786).
  * Always applicable; the cost model's fallback and upper bound.
  */
object PlainCodec extends TokenCodec {
  val id = 0; val name = "plain"
  def estimate(s: BlockStats): Long = 4L * s.n
  def encode(tokens: Array[Int]): Array[Byte] = intsToBytesLE(tokens)
  def decode(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = bytesToIntsLE(bytes)
    require(out.length == n, s"plain: expected $n ints, got ${out.length}")
    out
  }
  override def decodeSlice(bytes: Array[Byte], n: Int, from: Int, until: Int): Option[Array[Int]] = {
    val out = new Array[Int](until - from)
    var i = from
    while (i < until) { out(i - from) = readIntLE(bytes, i * 4); i += 1 }
    Some(out)
  }
}

/** Fixed-width bit packing at ceil(log2(max+1)) bits. Layout:
  * [width:u8][packed LSB-first]. Requires non-negative values.
  */
object BitPackCodec extends TokenCodec {
  val id = 1; val name = "bitpack"
  override def applicable(s: BlockStats): Boolean = s.min >= 0
  def estimate(s: BlockStats): Long =
    if (s.min < 0) Long.MaxValue else 1L + packedSize(s.n, bitsNeeded(s.max))
  def encode(tokens: Array[Int]): Array[Byte] = {
    var max = 0
    var i = 0
    while (i < tokens.length) {
      require(tokens(i) >= 0, "bitpack requires non-negative tokens")
      if (tokens(i) > max) max = tokens(i); i += 1
    }
    val w = bitsNeeded(max)
    val out = new Array[Byte](1 + packedSize(tokens.length, w))
    out(0) = w.toByte
    pack(tokens, 0, tokens.length, w, out, 1)
    out
  }
  def decode(bytes: Array[Byte], n: Int): Array[Int] = {
    val w = bytes(0) & 0xff
    val out = new Array[Int](n)
    unpack(bytes, 1, n, w, out, 0)
    out
  }
  override def decodeSlice(bytes: Array[Byte], n: Int, from: Int, until: Int): Option[Array[Int]] = {
    val w = bytes(0) & 0xff
    val out = new Array[Int](until - from)
    unpackRange(bytes, 1, w, from, until - from, out, 0)
    Some(out)
  }
}

/** Frame-of-reference: subtract the block min, bit-pack the deltas.
  * Layout: [min:int32 LE][width:u8][packed deltas]. Handles any Int range —
  * deltas are computed in 32-bit wraparound arithmetic whose low bits equal
  * the true unsigned delta (max-min < 2^32 always holds for Int).
  */
object ForCodec extends TokenCodec {
  val id = 2; val name = "for"
  def estimate(s: BlockStats): Long = {
    val range = (s.max.toLong - s.min.toLong) & 0xffffffffL
    5L + packedSize(s.n, bitsNeededLong(range))
  }
  def encode(tokens: Array[Int]): Array[Byte] = {
    var mn = Int.MaxValue; var mx = Int.MinValue
    var i = 0
    while (i < tokens.length) {
      val v = tokens(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    if (tokens.isEmpty) { mn = 0; mx = 0 }
    val range = (mx.toLong - mn.toLong) & 0xffffffffL
    val w = bitsNeededLong(range)
    val deltas = new Array[Int](tokens.length)
    i = 0
    while (i < tokens.length) { deltas(i) = tokens(i) - mn; i += 1 }
    val out = new Array[Byte](5 + packedSize(tokens.length, w))
    writeIntLE(out, 0, mn)
    out(4) = w.toByte
    pack(deltas, 0, deltas.length, w, out, 5)
    out
  }
  def decode(bytes: Array[Byte], n: Int): Array[Int] = {
    val mn = readIntLE(bytes, 0)
    val w = bytes(4) & 0xff
    val out = new Array[Int](n)
    unpack(bytes, 5, n, w, out, 0)
    var i = 0
    while (i < n) { out(i) += mn; i += 1 }
    out
  }
  override def decodeSlice(bytes: Array[Byte], n: Int, from: Int, until: Int): Option[Array[Int]] = {
    val mn = readIntLE(bytes, 0)
    val w = bytes(4) & 0xff
    val out = new Array[Int](until - from)
    unpackRange(bytes, 5, w, from, until - from, out, 0)
    var i = 0
    while (i < out.length) { out(i) += mn; i += 1 }
    Some(out)
  }
}

/** Delta encoding: first value verbatim, then fixed-width bit-packed
  * zigzag deltas in 32-bit wraparound arithmetic (the same wrap law as
  * [[ForCodec]], so any Int stream round-trips bit-exact). Layout:
  * [first:int32 LE][width:u8][packed zigzag(t_i - t_{i-1}) x (n-1)].
  * Wins on sorted/near-monotonic streams — posting lists, offset columns,
  * timestamp-like token ids — where the step is tiny but the RANGE spans
  * the whole space, which defeats FOR (range-width) and bitpack
  * (magnitude-width). The prefix dependency makes decode sequential, but a
  * slice still skips the TAIL: decodeSlice scans deltas only up to `until`
  * and materializes only [from, until).
  */
object DeltaCodec extends TokenCodec {
  val id = 6; val name = "delta"
  def estimate(s: BlockStats): Long =
    if (s.n == 0) 5L
    else 5L + packedSize(s.n - 1, bitsNeededLong(s.maxDeltaZz))
  def encode(tokens: Array[Int]): Array[Byte] = {
    val n = tokens.length
    val zz = new Array[Int](math.max(n - 1, 0))
    var maxZz = 0L
    var i = 1
    while (i < n) {
      val z = zigzag(tokens(i) - tokens(i - 1)) // wraparound delta, unsigned 32-bit zigzag
      if (z > maxZz) maxZz = z
      zz(i - 1) = z.toInt
      i += 1
    }
    val w = bitsNeededLong(maxZz)
    val out = new Array[Byte](5 + packedSize(zz.length, w))
    writeIntLE(out, 0, if (n == 0) 0 else tokens(0))
    out(4) = w.toByte
    pack(zz, 0, zz.length, w, out, 5)
    out
  }
  def decode(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    if (n == 0) return out
    val w = bytes(4) & 0xff
    var prev = readIntLE(bytes, 0)
    out(0) = prev
    val zz = new Array[Int](n - 1)
    unpack(bytes, 5, n - 1, w, zz, 0)
    var i = 1
    while (i < n) {
      prev = prev + unzigzag(zz(i - 1).toLong & 0xffffffffL)
      out(i) = prev
      i += 1
    }
    out
  }

  /** Prefix-bounded slice: the running sum needs every delta BEFORE `until`
    * (O(until) scan — unavoidable for a prefix code), but the tail is never
    * unpacked and only [from, until) is materialized. A point lookup early
    * in a large block therefore touches O(position), not O(blockTokens).
    */
  override def decodeSlice(bytes: Array[Byte], n: Int, from: Int, until: Int): Option[Array[Int]] = {
    val out = new Array[Int](until - from)
    if (until - from == 0) return Some(out)
    val w = bytes(4) & 0xff
    var prev = readIntLE(bytes, 0)
    if (from == 0) out(0) = prev
    if (until > 1) {
      val zz = new Array[Int](until - 1)
      unpack(bytes, 5, until - 1, w, zz, 0)
      var i = 1
      while (i < until) {
        prev = prev + unzigzag(zz(i - 1).toLong & 0xffffffffL)
        if (i >= from) out(i - from) = prev
        i += 1
      }
    }
    Some(out)
  }
}

/** Run-length encoding: [(value zigzag-varint, runLen varint)...] until n
  * tokens are produced. Wins on long constant runs.
  */
object RleCodec extends TokenCodec {
  val id = 3; val name = "rle"
  def estimate(s: BlockStats): Long = 5L * s.runs
  def encode(tokens: Array[Int]): Array[Byte] = {
    if (tokens.isEmpty) return Array.emptyByteArray
    // worst case: every token its own run -> (5 + 1) bytes per run
    val out = new Array[Byte](tokens.length * 11 + 16)
    var pos = 0
    var i = 0
    while (i < tokens.length) {
      val v = tokens(i)
      var run = 1
      while (i + run < tokens.length && tokens(i + run) == v) run += 1
      pos = writeVarint(out, pos, zigzag(v))
      pos = writeVarint(out, pos, run.toLong)
      i += run
    }
    java.util.Arrays.copyOf(out, pos)
  }
  def decode(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    val cur = new Cursor(0)
    var i = 0
    while (i < n) {
      val v = unzigzag(readVarint(bytes, cur))
      val run = readVarint(bytes, cur).toInt
      if (run <= 0 || i + run > n)
        throw new InvalidCodecException(
          s"rle: malformed run length $run at token $i of $n")
      java.util.Arrays.fill(out, i, i + run, v)
      i += run
    }
    out
  }

  /** Run headers allow skip-ahead: walk (value, runLen) pairs, fill only
    * the overlap with [from, until). Cost is O(runs up to `until`) varint
    * reads and O(slice) writes — rle is the most-selected codec in the
    * bench mix, so point lookups on rle blocks no longer pay a full-block
    * token materialization.
    */
  override def decodeSlice(bytes: Array[Byte], n: Int, from: Int, until: Int): Option[Array[Int]] = {
    val out = new Array[Int](until - from)
    val cur = new Cursor(0)
    var i = 0
    while (i < until) {
      val v = unzigzag(readVarint(bytes, cur))
      val run = readVarint(bytes, cur).toInt
      // a zero/negative run in a corrupt payload would pin i forever (the
      // full decode at least terminates at the byte cursor) — fail loud
      // like the other decoders instead of hanging the executor
      if (run <= 0 || i + run > n)
        throw new InvalidCodecException(
          s"rle: malformed run length $run at token $i of $n")
      val end = i + run
      if (end > from) {
        val s = math.max(i, from)
        val e = math.min(end, until)
        java.util.Arrays.fill(out, s - from, e - from, v)
      }
      i = end
    }
    Some(out)
  }
}

/** Dictionary encoding: sorted distinct values stored as delta varints, then
  * dense codes bit-packed at ceil(log2(|dict|)) bits. Layout:
  * [dictSize varint][first zigzag-varint][delta varints...][width:u8][codes],
  * where the first segment is the reusable TABLE and the rest the BODY.
  */
object DictCodec extends TableCodec {
  val id = 4; val name = "dict"
  val MaxDict = 1 << 20
  type Table = Array[Int] // sorted distinct values

  /** A/B kill-switch for the round-8 dict kernels (bitmap train +
    * dense-LUT encode): GRAFT_DICT_LEGACY=1 restores the sort-dedupe /
    * binary-search paths (JVM-wide, read once). DictKernelSpec pins the
    * two byte-identical.
    */
  private val useLegacy: Boolean = sys.env.contains("GRAFT_DICT_LEGACY")

  override def applicable(s: BlockStats): Boolean = s.distinctExact
  def estimate(s: BlockStats): Long =
    if (!s.distinctExact) Long.MaxValue
    else {
      val w = if (s.distinct <= 1) 0 else bitsNeeded(s.distinct - 1)
      4L + 3L * s.distinct + 1L + packedSize(s.n, w)
    }

  def train(tokens: Array[Int]): Array[Int] = {
    // The r8 JFR profile put the block sort (~118k tokens/block at the
    // bench fixture) high in encode self-time; when the value range is
    // vocab-sized, a dense bitmap yields the identical sorted-distinct
    // dict in O(n + range/64) with no sort. Wide-range data falls back
    // to the original sort-dedupe. Both paths produce the same array.
    if (tokens.isEmpty) return new Array[Int](0)
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var i = 0
    while (i < tokens.length) {
      val v = tokens(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    val range = mx.toLong - mn.toLong
    if (!useLegacy && range < Analyzer.BitmapRangeCap) {
      val bm = new Array[Long]((range >>> 6).toInt + 1)
      i = 0
      while (i < tokens.length) {
        val idx = tokens(i) - mn
        bm(idx >>> 6) |= (1L << idx) // JVM shift masks idx & 63
        i += 1
      }
      var d = 0
      var w = 0
      while (w < bm.length) { d += java.lang.Long.bitCount(bm(w)); w += 1 }
      require(d <= MaxDict, s"dict too large: $d")
      val dict = new Array[Int](d)
      var o = 0
      w = 0
      while (w < bm.length) {
        var bits = bm(w)
        while (bits != 0L) {
          dict(o) = mn + (w << 6) + java.lang.Long.numberOfTrailingZeros(bits)
          o += 1
          bits &= bits - 1
        }
        w += 1
      }
      dict
    } else {
      // sort a copy, dedupe in place -> sorted dict (boxing-free)
      val sorted = tokens.clone()
      java.util.Arrays.sort(sorted)
      var d = 0
      i = 0
      while (i < sorted.length) {
        if (d == 0 || sorted(i) != sorted(d - 1)) { sorted(d) = sorted(i); d += 1 }
        i += 1
      }
      require(d <= MaxDict, s"dict too large: $d")
      java.util.Arrays.copyOf(sorted, d)
    }
  }

  def tableBytes(dict: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](10 + 10 * dict.length)
    var pos = writeVarint(out, 0, dict.length.toLong)
    if (dict.nonEmpty) {
      pos = writeVarint(out, pos, zigzag(dict(0)))
      var i = 1
      while (i < dict.length) {
        pos = writeVarint(out, pos, (dict(i).toLong - dict(i - 1).toLong))
        i += 1
      }
    }
    java.util.Arrays.copyOf(out, pos)
  }

  def tableFromBytes(b: Array[Byte]): Array[Int] = {
    val cur = new Cursor(0)
    val dict = readTable(b, cur)
    dict
  }

  private def readTable(bytes: Array[Byte], cur: Cursor): Array[Int] = {
    val dictSize = readVarint(bytes, cur).toInt
    val dict = new Array[Int](dictSize)
    if (dictSize > 0) {
      dict(0) = unzigzag(readVarint(bytes, cur))
      var i = 1
      while (i < dictSize) {
        dict(i) = (dict(i - 1).toLong + readVarint(bytes, cur)).toInt
        i += 1
      }
    }
    dict
  }

  /** Dense value->code table when the dict's span is vocab-sized: O(1)
    * lookups instead of the per-token binary search that topped the r8
    * JFR encode profile. Cached per dict INSTANCE (reference equality)
    * and per thread, so a cached table reused across a run of blocks
    * (tryCached) builds its LUT once. -1 marks absent values.
    */
  private val LutSpanCap = 1 << 20 // 4 MiB int[] worst case
  private val lutCache = new ThreadLocal[(Array[Int], Array[Int])]

  private def lutFor(dict: Array[Int], nTokens: Int): Array[Int] = {
    if (useLegacy) return null
    val span = dict(dict.length - 1).toLong - dict(0).toLong
    if (span >= LutSpanCap) return null
    val e = lutCache.get()
    if (e != null && (e._1 eq dict)) return e._2
    // fresh build is O(span) fill: only worth it when the block (times the
    // typical tryCached reuse run it seeds) amortizes that over enough
    // O(1) lookups — a small block against a wide-span dict would pay a
    // multi-MiB fill to replace a few hundred binary searches (ADVICE r8)
    if (nTokens.toLong * 64 < span) return null
    val base = dict(0)
    val lut = new Array[Int](span.toInt + 1)
    java.util.Arrays.fill(lut, -1)
    var i = 0
    while (i < dict.length) { lut(dict(i) - base) = i; i += 1 }
    lutCache.set((dict, lut))
    lut
  }

  def encodeWith(dict: Array[Int], tokens: Array[Int]): Option[Array[Byte]] = {
    val codes = new Array[Int](tokens.length)
    val lut = if (dict.nonEmpty) lutFor(dict, tokens.length) else null
    var i = 0
    if (lut != null) {
      val base = dict(0)
      val top = dict(dict.length - 1)
      while (i < tokens.length) {
        val v = tokens(i)
        if (v < base || v > top) return None // outside the cached dictionary
        val c = lut(v - base)
        if (c < 0) return None
        codes(i) = c
        i += 1
      }
    } else {
      while (i < tokens.length) {
        val c = java.util.Arrays.binarySearch(dict, tokens(i))
        if (c < 0) return None // value outside the cached dictionary
        codes(i) = c
        i += 1
      }
    }
    val w = if (dict.length <= 1) 0 else bitsNeeded(dict.length - 1)
    val out = new Array[Byte](1 + packedSize(tokens.length, w))
    out(0) = w.toByte
    pack(codes, 0, codes.length, w, out, 1)
    Some(out)
  }

  def decodeWith(tableB: Array[Byte], body: Array[Byte], n: Int): Array[Int] = {
    val dict = tableFromBytes(tableB)
    val w = body(0) & 0xff
    val codes = new Array[Int](n)
    unpack(body, 1, n, w, codes, 0)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = dict(codes(i)); i += 1 }
    out
  }

  override def decodeWithSlice(tableB: Array[Byte], body: Array[Byte], n: Int,
                               from: Int, until: Int): Option[Array[Int]] = {
    // table parse is O(dict) — tiny next to the skipped code stream
    val dict = tableFromBytes(tableB)
    val w = body(0) & 0xff
    val out = new Array[Int](until - from)
    unpackRange(body, 1, w, from, until - from, out, 0)
    var i = 0
    while (i < out.length) { out(i) = dict(out(i)); i += 1 }
    Some(out)
  }

  def reusable(dict: Array[Int], s: BlockStats): Boolean =
    dict.nonEmpty && s.min >= dict(0) && s.max <= dict(dict.length - 1) &&
      // reuse must not widen the per-code bit width at all: +1 bit on the
      // codes costs ~8% of the body to save a ~4% table — a losing trade
      bitsNeeded(math.max(dict.length - 1, 1)) <=
        bitsNeeded(math.max(s.distinct - 1, 1))

  def encode(tokens: Array[Int]): Array[Byte] = {
    val dict = train(tokens)
    val t = tableBytes(dict)
    val b = encodeWith(dict, tokens).get
    val out = new Array[Byte](t.length + b.length)
    System.arraycopy(t, 0, out, 0, t.length)
    System.arraycopy(b, 0, out, t.length, b.length)
    out
  }

  def decode(bytes: Array[Byte], n: Int): Array[Int] = {
    val cur = new Cursor(0)
    val dict = readTable(bytes, cur)
    val w = bytes(cur.pos) & 0xff; cur.pos += 1
    val codes = new Array[Int](n)
    unpack(bytes, cur.pos, n, w, codes, 0)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = dict(codes(i)); i += 1 }
    out
  }

  override def decodeSlice(bytes: Array[Byte], n: Int, from: Int, until: Int): Option[Array[Int]] = {
    val cur = new Cursor(0)
    val dict = readTable(bytes, cur)
    val w = bytes(cur.pos) & 0xff; cur.pos += 1
    val out = new Array[Int](until - from)
    unpackRange(bytes, cur.pos, w, from, until - from, out, 0)
    var i = 0
    while (i < out.length) { out(i) = dict(out(i)); i += 1 }
    Some(out)
  }
}

/** FSST-style static symbol-table compression adapted from byte strings
  * (Boncz/Neumann/Freitag, "FSST: Fast Random Access String Compression",
  * VLDB 2020) to int-token streams: iterative rounds of frequent-pair
  * merging (BPE-like) build a symbol table whose entries reference tokens or
  * earlier symbols; the merged stream is then dictionary-encoded. Fully
  * deterministic (frequency-then-value tie-breaks) for resumability.
  *
  * Layout: [nSymbols varint][(left varint, right varint) x nSymbols]
  *         [body], where body =
  *         [mergedLen varint][nSync varint]
  *         [(mergedIdx delta varint, outTok delta varint) x nSync]
  *         [DictCodec bytes of merged stream].
  * Symbol s (0-based) is referenced in streams/pairs as SymbolBase + s.
  *
  * VERSIONED NAME (ADVICE r7): new blocks are written under the explicit
  * codec name "fsst2", which means exactly the sync-table layout above —
  * no structural sniffing on the write path's name, ever. Blocks persisted
  * by rounds ≤7 exist under the single name "fsst" in BOTH the sync-table
  * layout and the PRE-sync-table legacy layout ([mergedLen][DictCodec
  * bytes]); those dispatch to [[FsstLegacyCodec]], whose [[parseBody]]
  * keeps the structural detector (byte-exact dict-length equation + sync
  * invariants). The ambiguity window is frozen at already-persisted
  * blocks: the cost model never selects the legacy codec and the policy
  * alias "fsst" resolves to the "fsst2" writer, so the ambiguous name
  * cannot be written again. Any future body reshape bumps the name (fsst3).
  *
  * The sync table records (merged position, output token position) every
  * ~[[SyncInterval]] output tokens, so range reads resume mid-stream:
  * [[decodeSlice]]/[[decodeWithSlice]] binary-search the last sync at or
  * before the slice, dict-decode only the merged codes between that sync
  * and the slice end (the dict body is random-access), and expand with
  * clipping — O(result + SyncInterval) work instead of a full-block decode,
  * closing the last sequential-codec fallback in the engine's range reads.
  */
object FsstCodec extends TableCodec {
  val id = 5; val name = "fsst2"
  val SymbolBase: Int = 1 << 28
  val MaxRounds = 6
  val PairsPerRound = 96
  val MinPairFreq = 4
  val SyncInterval = 4096

  /** Trained pair-merge symbol table: symbol s = (left(s), right(s)),
    * operands are tokens or earlier symbols (SymbolBase + idx).
    */
  final case class FsstTable(left: Array[Int], right: Array[Int]) {
    def size: Int = left.length
  }
  type Table = FsstTable

  override def applicable(s: BlockStats): Boolean =
    s.min >= 0 && s.max < SymbolBase && s.distinctExact

  def estimate(s: BlockStats): Long = {
    if (!applicable(s)) return Long.MaxValue
    // assume multi-round merging roughly doubles the single-round pair gain,
    // capped at half the stream; symbol table overhead ~6 bytes/symbol
    val gain = math.min(s.pairGain.toLong * 2, s.n / 2L)
    val n2 = s.n - gain
    val alpha = s.distinct + 512
    val w = bitsNeeded(alpha - 1)
    val size = 6L * 512 + 4L + 3L * alpha + packedSize(n2.toInt, w)
    // cost-aware selection: fsst encode is ~5x the CPU of dict/rle, so it
    // must beat them by a margin, not a hair (same trade the reference
    // makes preferring native backends only when they exist cheaply)
    size + size / 7
  }

  def encode(tokens: Array[Int]): Array[Byte] = {
    val (table, merged) = trainAndMerge(tokens)
    val t = tableBytes(table)
    val b = bodyOf(table, merged)
    val out = new Array[Byte](t.length + b.length)
    System.arraycopy(t, 0, out, 0, t.length)
    System.arraycopy(b, 0, out, t.length, b.length)
    out
  }

  def train(tokens: Array[Int]): FsstTable = trainAndMerge(tokens)._1

  def tableBytes(t: FsstTable): Array[Byte] = {
    val out = new Array[Byte](10 + 10 * t.size)
    var pos = writeVarint(out, 0, t.size.toLong)
    var s = 0
    while (s < t.size) {
      pos = writeVarint(out, pos, t.left(s).toLong)
      pos = writeVarint(out, pos, t.right(s).toLong)
      s += 1
    }
    java.util.Arrays.copyOf(out, pos)
  }

  def tableFromBytes(b: Array[Byte]): FsstTable = {
    val cur = new Cursor(0)
    tableFrom(b, cur)
  }

  private def tableFrom(bytes: Array[Byte], cur: Cursor): FsstTable = {
    val nSym = readVarint(bytes, cur).toInt
    val left = new Array[Int](nSym)
    val right = new Array[Int](nSym)
    var s = 0
    while (s < nSym) {
      left(s) = readVarint(bytes, cur).toInt
      right(s) = readVarint(bytes, cur).toInt
      s += 1
    }
    FsstTable(left, right)
  }

  /** Per-symbol expanded token counts; symbols only reference EARLIER
    * symbols (training invariant), so one forward pass suffices.
    */
  private def lengthsOf(t: FsstTable): Array[Int] = {
    val len = new Array[Int](t.size)
    var s = 0
    while (s < t.size) {
      def l(x: Int): Int =
        if (x < SymbolBase) 1
        else {
          val r = x - SymbolBase
          require(r < s, s"fsst: symbol $s references later symbol $r")
          len(r)
        }
      len(s) = l(t.left(s)) + l(t.right(s))
      s += 1
    }
    len
  }

  private def bodyOf(t: FsstTable, merged: Array[Int]): Array[Byte] = {
    // sync table: (merged idx, output token idx) whenever ~SyncInterval
    // output tokens have accumulated since the last entry; (0, 0) implicit
    val symLen = lengthsOf(t)
    val syncM = new scala.collection.mutable.ArrayBuffer[Int]()
    val syncOut = new scala.collection.mutable.ArrayBuffer[Int]()
    var outPos = 0
    var lastSync = 0
    var i = 0
    while (i < merged.length) {
      if (outPos - lastSync >= SyncInterval) {
        syncM += i; syncOut += outPos; lastSync = outPos
      }
      val v = merged(i)
      outPos += (if (v >= SymbolBase) symLen(v - SymbolBase) else 1)
      i += 1
    }
    val dictB = DictCodec.encode(merged)
    val out = new Array[Byte](20 + 10 * syncM.length + dictB.length)
    var pos = writeVarint(out, 0, merged.length.toLong)
    pos = writeVarint(out, pos, syncM.length.toLong)
    var k = 0
    var pm = 0
    var po = 0
    while (k < syncM.length) {
      pos = writeVarint(out, pos, (syncM(k) - pm).toLong)
      pos = writeVarint(out, pos, (syncOut(k) - po).toLong)
      pm = syncM(k); po = syncOut(k)
      k += 1
    }
    System.arraycopy(dictB, 0, out, pos, dictB.length)
    java.util.Arrays.copyOf(out, pos + dictB.length)
  }

  /** Re-encode a new block with an already-trained table: skip the bigram
    * counting + top-K rounds (the dominant encode CPU) and just replay
    * greedy non-overlapping replacement passes until fixpoint. Always
    * succeeds for fsst-applicable blocks — a poorly matching table only
    * costs ratio, never correctness (caller retrains periodically).
    */
  def encodeWith(t: FsstTable, tokens: Array[Int]): Option[Array[Byte]] = {
    val pairMap = new LongIntMap(math.max(t.size * 4, 16))
    var s = 0
    while (s < t.size) {
      val key = (t.left(s).toLong << 32) | (t.right(s).toLong & 0xffffffffL)
      pairMap.addTo(key, SymbolBase + s)
      s += 1
    }
    var stream = tokens
    var passes = 0
    var replaced = true
    while (replaced && passes < MaxRounds + 2) {
      val out = new Array[Int](stream.length)
      var o = 0
      var i = 0
      while (i < stream.length) {
        if (i + 1 < stream.length) {
          val key = (stream(i).toLong << 32) | (stream(i + 1).toLong & 0xffffffffL)
          val sym = pairMap.get(key, -1)
          if (sym >= 0) { out(o) = sym; o += 1; i += 2 }
          else { out(o) = stream(i); o += 1; i += 1 }
        } else { out(o) = stream(i); o += 1; i += 1 }
      }
      replaced = o < stream.length
      stream = java.util.Arrays.copyOf(out, o)
      passes += 1
    }
    Some(bodyOf(t, stream))
  }

  /** Parsed body header: merged length, absolute sync tables, and the
    * offset of the embedded DictCodec bytes.
    */
  private[graft] final class BodyHeader(val mergedLen: Int, val syncM: Array[Int],
                                        val syncOut: Array[Int], val dictOff: Int)

  /** Parse the body header at `start`. Under the versioned name "fsst2"
    * (acceptLegacy = false, this object's own decode paths) ONLY the
    * current layout ([mergedLen][nSync][sync deltas][dict]) is legal — a
    * legacy-shaped body under that name is corruption and fails loudly.
    * Blocks persisted under the pre-versioned name "fsst" (rounds ≤7,
    * [[FsstLegacyCodec]], acceptLegacy = true) also accept the legacy
    * layout ([mergedLen][dict]) via structural detection (ADVICE r6):
    * a layout is accepted only when its embedded DictCodec stream of
    * exactly mergedLen codes ends exactly at the body's last byte, and
    * (current layout) the sync table obeys its writer's invariants —
    * nSync ≤ n/SyncInterval, merged indexes strictly increasing below
    * mergedLen, output indexes spaced ≥ SyncInterval below n. A legacy
    * body misread as current would have to satisfy all of those AND the
    * byte-length equation simultaneously; the current layout wins that
    * (never-observed) double fit, being what the round-≤7 writer emitted.
    * The detector exists ONLY for those already-persisted "fsst" blocks —
    * the ambiguity window cannot grow (ADVICE r7).
    */
  private[graft] def parseBody(body: Array[Byte], start: Int, n: Int,
                               acceptLegacy: Boolean): BodyHeader =
    parseCurrent(body, start, n)
      .orElse(if (acceptLegacy) parseLegacy(body, start) else None)
      .getOrElse(throw new InvalidCodecException(
        if (acceptLegacy)
          s"fsst: body at offset $start matches neither the sync-table nor the legacy layout"
        else
          s"fsst2: body at offset $start does not match the sync-table layout"))

  private def parseCurrent(body: Array[Byte], start: Int, n: Int): Option[BodyHeader] =
    try {
      val cur = new Cursor(start)
      val mergedLen = readVarint(body, cur).toInt
      // empty blocks legitimately carry mergedLen == 0 (n == 0)
      if (mergedLen < 0 || mergedLen > n) return None
      val nSync = readVarint(body, cur).toInt
      if (nSync < 0 || nSync > n / SyncInterval) return None
      val sm = new Array[Int](nSync)
      val so = new Array[Int](nSync)
      var pm = 0
      var po = 0
      var k = 0
      while (k < nSync) {
        val dm = readVarint(body, cur).toInt
        val dOut = readVarint(body, cur).toInt
        if (dm < 1 || dOut < SyncInterval) return None
        pm += dm; po += dOut
        if (pm >= mergedLen || po >= n) return None
        sm(k) = pm; so(k) = po
        k += 1
      }
      if (dictFits(body, cur.pos, mergedLen))
        Some(new BodyHeader(mergedLen, sm, so, cur.pos))
      else None
    } catch { case _: ArrayIndexOutOfBoundsException => None }

  private def parseLegacy(body: Array[Byte], start: Int): Option[BodyHeader] =
    try {
      val cur = new Cursor(start)
      val mergedLen = readVarint(body, cur).toInt
      if (mergedLen >= 0 && dictFits(body, cur.pos, mergedLen))
        Some(new BodyHeader(mergedLen,
          Array.emptyIntArray, Array.emptyIntArray, cur.pos))
      else None
    } catch { case _: ArrayIndexOutOfBoundsException => None }

  /** Byte-exact structural check that `off` begins a DictCodec stream of
    * exactly `mergedLen` codes that ends exactly at the body's last byte:
    * [dictSize][dictSize varints][width:u8][packedSize(mergedLen, width)].
    * O(dictSize) varint skips — the same table bytes the decode re-parses
    * right after, so at most table-parse cost is doubled.
    */
  private def dictFits(body: Array[Byte], off: Int, mergedLen: Int): Boolean =
    try {
      val cur = new Cursor(off)
      val dictSize = readVarint(body, cur).toInt
      if (dictSize < 0 || dictSize > DictCodec.MaxDict) return false
      var i = 0
      while (i < dictSize) { readVarint(body, cur); i += 1 } // first + deltas
      if (cur.pos >= body.length) return false
      val w = body(cur.pos) & 0xff
      w <= 32 && cur.pos + 1 + packedSize(mergedLen, w) == body.length
    } catch { case _: ArrayIndexOutOfBoundsException => false }

  def decodeWith(tableB: Array[Byte], body: Array[Byte], n: Int): Array[Int] =
    decodeWithImpl(tableB, body, n, acceptLegacy = false)

  private[graft] def decodeWithImpl(tableB: Array[Byte], body: Array[Byte],
                                    n: Int, acceptLegacy: Boolean): Array[Int] = {
    val t = tableFromBytes(tableB)
    val h = parseBody(body, 0, n, acceptLegacy)
    val dictB = java.util.Arrays.copyOfRange(body, h.dictOff, body.length)
    val merged = DictCodec.decode(dictB, h.mergedLen)
    expand(t.left, t.right, merged, n)
  }

  override def decodeWithSlice(tableB: Array[Byte], body: Array[Byte], n: Int,
                               from: Int, until: Int): Option[Array[Int]] =
    Some(sliceBody(tableFromBytes(tableB), body, 0, n, from, until,
      acceptLegacy = false))

  private[graft] def decodeWithSliceImpl(tableB: Array[Byte], body: Array[Byte],
                                         n: Int, from: Int, until: Int,
                                         acceptLegacy: Boolean): Option[Array[Int]] =
    Some(sliceBody(tableFromBytes(tableB), body, 0, n, from, until, acceptLegacy))

  /** Sync-point slice: last sync ≤ `from` bounds where expansion starts,
    * first sync ≥ `until` bounds which merged codes are dict-decoded at
    * all; symbols straddling the slice edges expand with clipping.
    */
  private def sliceBody(t: FsstTable, bytes: Array[Byte], bodyStart: Int,
                        n: Int, from: Int, until: Int,
                        acceptLegacy: Boolean): Array[Int] = {
    val out = new Array[Int](until - from)
    if (until == from) return out
    val h = parseBody(bytes, bodyStart, n, acceptLegacy)
    // start: greatest sync with outTok <= from ((0,0) is implicit)
    var lo = 0
    var hi = h.syncOut.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (h.syncOut(mid) <= from) lo = mid + 1 else hi = mid
    }
    val m0 = if (lo == 0) 0 else h.syncM(lo - 1)
    val out0 = if (lo == 0) 0 else h.syncOut(lo - 1)
    // end bound: first sync with outTok >= until caps the merged span
    var lo2 = lo
    hi = h.syncOut.length
    while (lo2 < hi) {
      val mid = (lo2 + hi) >>> 1
      if (h.syncOut(mid) < until) lo2 = mid + 1 else hi = mid
    }
    val mEnd = if (lo2 < h.syncM.length) h.syncM(lo2) else h.mergedLen
    val dictB = java.util.Arrays.copyOfRange(bytes, h.dictOff, bytes.length)
    val codes = DictCodec.decodeSlice(dictB, h.mergedLen, m0, mEnd).get
    val symLen = lengthsOf(t)
    val stack = new Array[Int](64)
    var outPos = out0
    var ci = 0
    while (outPos < until && ci < codes.length) {
      val v = codes(ci)
      val len = if (v >= SymbolBase) symLen(v - SymbolBase) else 1
      if (outPos + len <= from) outPos += len // fully before the slice: skip
      else {
        var top = 0
        stack(top) = v; top += 1
        while (top > 0) {
          top -= 1
          val x = stack(top)
          if (x >= SymbolBase) {
            val s = x - SymbolBase
            stack(top) = t.right(s); top += 1
            stack(top) = t.left(s); top += 1
          } else {
            if (outPos >= from && outPos < until) out(outPos - from) = x
            outPos += 1
          }
        }
      }
      ci += 1
    }
    require(outPos >= until,
      s"fsst: slice [$from,$until) of $n exhausted codes at $outPos")
    out
  }

  def reusable(t: FsstTable, s: BlockStats): Boolean =
    s.min >= 0 && s.max < SymbolBase

  private def trainAndMerge(tokens: Array[Int]): (FsstTable, Array[Int]) = {
    var stream = tokens
    val symLeft = new java.util.ArrayList[Integer]()
    val symRight = new java.util.ArrayList[Integer]()
    var round = 0
    var continue = stream.length >= 8
    while (round < MaxRounds && continue) {
      // count bigram frequencies (primitive map, right-sized up front so
      // the first rounds never rehash)
      val freq = new LongIntMap(math.min(math.max(stream.length, 64), 1 << 18))
      var i = 0
      while (i + 1 < stream.length) {
        val key = (stream(i).toLong << 32) | (stream(i + 1).toLong & 0xffffffffL)
        freq.increment(key)
        i += 1
      }
      // top-K selection via a fixed-size min-heap of packed
      // (count:int32 | entryIdx:int32) longs — O(entries * log K), no
      // boxing, no full sort. Tie-break on entry index, which is the
      // map's deterministic probe order for identical input.
      val (ks, vs) = freq.entries
      val heapN = math.min(PairsPerRound, vs.length)
      val heap = new Array[Long](heapN)
      var hs = 0
      i = 0
      while (i < vs.length) {
        if (vs(i) >= MinPairFreq) {
          val packed = (vs(i).toLong << 32) | (i.toLong & 0xffffffffL)
          if (hs < heapN) {
            heap(hs) = packed; hs += 1
            if (hs == heapN) java.util.Arrays.sort(heap) // heapify-by-sort once
          } else if (packed > heap(0)) {
            // replace min, sift down (heap(0) is min after sort; maintain
            // via simple binary min-heap)
            heap(0) = packed
            var p = 0
            var cont = true
            while (cont) {
              val l = 2 * p + 1; val r = 2 * p + 2
              var m = p
              if (l < heapN && heap(l) < heap(m)) m = l
              if (r < heapN && heap(r) < heap(m)) m = r
              if (m == p) cont = false
              else { val t = heap(p); heap(p) = heap(m); heap(m) = t; p = m }
            }
          }
        }
        i += 1
      }
      // deterministic order: count desc, then entry idx asc
      val top = java.util.Arrays.copyOf(heap, hs)
      java.util.Arrays.sort(top)
      val picked = new LongIntMap(PairsPerRound * 4)
      var k = top.length - 1
      while (k >= 0) {
        val e = (top(k) & 0xffffffffL).toInt
        val sym = SymbolBase + symLeft.size()
        symLeft.add((ks(e) >>> 32).toInt)
        symRight.add((ks(e) & 0xffffffffL).toInt)
        picked.addTo(ks(e), sym)
        k -= 1
      }
      if (picked.size == 0) continue = false
      else {
        // greedy non-overlapping left-to-right replacement
        val out = new Array[Int](stream.length)
        var o = 0
        i = 0
        while (i < stream.length) {
          if (i + 1 < stream.length) {
            val key = (stream(i).toLong << 32) | (stream(i + 1).toLong & 0xffffffffL)
            val sym = picked.get(key, -1)
            if (sym >= 0) { out(o) = sym; o += 1; i += 2 }
            else { out(o) = stream(i); o += 1; i += 1 }
          } else { out(o) = stream(i); o += 1; i += 1 }
        }
        val gained = stream.length - o
        stream = java.util.Arrays.copyOf(out, o)
        if (gained < stream.length / 64 + 1) continue = false
      }
      round += 1
    }
    val nSym = symLeft.size()
    val left = new Array[Int](nSym)
    val right = new Array[Int](nSym)
    var s = 0
    while (s < nSym) {
      left(s) = symLeft.get(s)
      right(s) = symRight.get(s)
      s += 1
    }
    (FsstTable(left, right), stream)
  }

  def decode(bytes: Array[Byte], n: Int): Array[Int] =
    decodeImpl(bytes, n, acceptLegacy = false)

  private[graft] def decodeImpl(bytes: Array[Byte], n: Int,
                                acceptLegacy: Boolean): Array[Int] = {
    val cur = new Cursor(0)
    val t = tableFrom(bytes, cur)
    val h = parseBody(bytes, cur.pos, n, acceptLegacy)
    val body = java.util.Arrays.copyOfRange(bytes, h.dictOff, bytes.length)
    val merged = DictCodec.decode(body, h.mergedLen)
    expand(t.left, t.right, merged, n)
  }

  override def decodeSlice(bytes: Array[Byte], n: Int, from: Int, until: Int): Option[Array[Int]] =
    decodeSliceImpl(bytes, n, from, until, acceptLegacy = false)

  private[graft] def decodeSliceImpl(bytes: Array[Byte], n: Int, from: Int,
                                     until: Int, acceptLegacy: Boolean): Option[Array[Int]] = {
    val cur = new Cursor(0)
    val t = tableFrom(bytes, cur)
    Some(sliceBody(t, bytes, cur.pos, n, from, until, acceptLegacy))
  }

  /** Iterative symbol expansion with an explicit stack (symbols reference
    * earlier symbols; depth bounded by MaxRounds).
    */
  private def expand(left: Array[Int], right: Array[Int],
                     merged: Array[Int], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var o = 0
    val stack = new Array[Int](64)
    var i = 0
    while (i < merged.length) {
      var top = 0
      stack(top) = merged(i); top += 1
      while (top > 0) {
        top -= 1
        val v = stack(top)
        if (v >= SymbolBase) {
          val sym = v - SymbolBase
          stack(top) = right(sym); top += 1
          stack(top) = left(sym); top += 1
        } else {
          out(o) = v; o += 1
        }
      }
      i += 1
    }
    require(o == n, s"fsst: expanded $o tokens, expected $n")
    out
  }
}

/** Decode-only dispatch target for blocks persisted under the PRE-versioned
  * name "fsst" (ADVICE r7). Rounds ≤7 wrote BOTH the legacy
  * [mergedLen][dict] body and the current sync-table body under that one
  * name, so this codec's decode paths keep the structural layout detector.
  * It can never WRITE: the cost model skips it (applicable = false,
  * estimate = MaxValue), encode throws, and the policy alias "fsst"
  * resolves to [[FsstCodec]] ("fsst2") — the ambiguous name is frozen at
  * the blocks that already exist.
  */
object FsstLegacyCodec extends TableCodec {
  val id = 7; val name = "fsst"
  type Table = FsstCodec.FsstTable

  override def applicable(s: BlockStats): Boolean = false
  def estimate(s: BlockStats): Long = Long.MaxValue
  def encode(tokens: Array[Int]): Array[Byte] =
    throw new InvalidCodecException(
      "codec 'fsst' is decode-only (pre-versioned name); new blocks are written as 'fsst2'")
  def encodeWith(t: Table, tokens: Array[Int]): Option[Array[Byte]] =
    throw new InvalidCodecException(
      "codec 'fsst' is decode-only (pre-versioned name); new blocks are written as 'fsst2'")
  def reusable(t: Table, s: BlockStats): Boolean = false

  def train(tokens: Array[Int]): Table = FsstCodec.train(tokens)
  def tableBytes(t: Table): Array[Byte] = FsstCodec.tableBytes(t)
  def tableFromBytes(b: Array[Byte]): Table = FsstCodec.tableFromBytes(b)

  def decode(bytes: Array[Byte], n: Int): Array[Int] =
    FsstCodec.decodeImpl(bytes, n, acceptLegacy = true)
  override def decodeSlice(bytes: Array[Byte], n: Int, from: Int, until: Int): Option[Array[Int]] =
    FsstCodec.decodeSliceImpl(bytes, n, from, until, acceptLegacy = true)
  def decodeWith(tableB: Array[Byte], body: Array[Byte], n: Int): Array[Int] =
    FsstCodec.decodeWithImpl(tableB, body, n, acceptLegacy = true)
  override def decodeWithSlice(tableB: Array[Byte], body: Array[Byte], n: Int,
                               from: Int, until: Int): Option[Array[Int]] =
    FsstCodec.decodeWithSliceImpl(tableB, body, n, from, until, acceptLegacy = true)
}

/** Closed-world codec dispatch, the analog of the reference's enum→impl
  * if/else chains with `InvalidFormat` on unknown ids
  * (/root/reference/src/EncodeTools.ts:784-796, 301-310).
  */
object CodecRegistry {
  val all: Seq[TokenCodec] =
    Seq(PlainCodec, BitPackCodec, ForCodec, RleCodec, DictCodec, FsstCodec,
      DeltaCodec, FsstLegacyCodec)

  private val byIdMap: Map[Int, TokenCodec] = all.map(c => c.id -> c).toMap
  private val byNameMap: Map[String, TokenCodec] = all.map(c => c.name -> c).toMap

  def byId(id: Int): TokenCodec =
    byIdMap.getOrElse(id, throw new InvalidCodecException(s"unknown codec id $id"))
  def byName(name: String): TokenCodec =
    byNameMap.getOrElse(name, throw new InvalidCodecException(s"unknown codec '$name'"))

  /** Policy-name resolution for ENCODING. Decode-only legacy names alias to
    * their current writer ("fsst" → "fsst2"), so a pinned codec policy from
    * an earlier round keeps working without ever writing the ambiguous
    * pre-versioned name again (ADVICE r7).
    */
  def forPolicy(name: String): TokenCodec = name match {
    case FsstLegacyCodec.name => FsstCodec
    case other => byName(other)
  }

  def encode(name: String, tokens: Array[Int]): Array[Byte] =
    byName(name).encode(tokens)
  def decode(name: String, bytes: Array[Byte], n: Int): Array[Int] =
    byName(name).decode(bytes, n)
}
