package graft

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.TaskContext

/** Optional zstd entropy frame around codec bytes — the analog of the
  * reference's general-purpose compression stage (`compressZStd`,
  * /root/reference/src/EncodeTools.ts:1630-1642), using zstd-jni (present in
  * /opt/spark/jars) with a capability probe + plain fallback mirroring the
  * reference's `Buffer.isEncoding` fast-path pattern
  * (/root/reference/src/EncodeTools.ts:663-664, 678-679).
  */
object Zframe {
  lazy val available: Boolean =
    try {
      com.github.luben.zstd.Zstd.compress(Array[Byte](1, 2, 3), 1)
      true
    } catch { case _: Throwable => false }

  /** Returns (framedOrPlain, outerName). Frames only when it shrinks. */
  def frame(bytes: Array[Byte], level: Int): (Array[Byte], String) = {
    if (level <= 0 || !available || bytes.length < 64) return (bytes, "none")
    val z = com.github.luben.zstd.Zstd.compress(bytes, level)
    if (z.length < bytes.length) (z, "zstd") else (bytes, "none")
  }

  def unframe(bytes: Array[Byte], outer: String): Array[Byte] = outer match {
    case "none" => bytes
    case "zstd" =>
      val n = com.github.luben.zstd.Zstd.getFrameContentSize(bytes)
      com.github.luben.zstd.Zstd.decompress(bytes, n.toInt)
    case other => throw new InvalidCodecException(s"unknown outer frame '$other'")
  }
}

/** The engine facade — typed Dataset transforms, the Spark-native analog of
  * the `EncodeTools` instance (options + dispatch,
  * /root/reference/src/EncodeTools.ts:417-428). One `encode` call fuses the
  * reference's serialize → encode → checksum pipeline
  * (`encodeObject`, /root/reference/src/EncodeTools.ts:1506-1516) into a
  * single narrow mapPartitions stage after one explicit range exchange.
  */
class TokenCompressor(val opts: EncodeOptions) extends Serializable {

  /** Encode a token table into blocks. Rows are range-clustered on doc_id
    * (deterministic plan, see [[Planner]]) then block-encoded per partition:
    * analyze → cost-model select → encode → zstd frame → xxhash64 checksum.
    */
  def encode(ds: Dataset[TokenRow]): Dataset[EncodedBlock] = {
    val spark = ds.sparkSession
    val plan = Planner.plan(ds, opts)
    encodeWithPlan(ds, plan, None)
  }

  /** Encode restricted to the given part ids (resume path); `plan` fixes the
    * doc_id range boundaries so part ids are stable across runs.
    */
  def encodeWithPlan(
      ds: Dataset[TokenRow],
      plan: PartitionPlan,
      onlyParts: Option[Set[Int]]
  ): Dataset[EncodedBlock] = {
    val spark = ds.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, udf}
    val o = opts
    val planB = spark.sparkContext.broadcast(plan)

    // part_id as a column expression (UDF over doc_id only) keeps rows in
    // Tungsten format through the exchange + sort — token arrays are
    // deserialized exactly once, in the final mapPartitions
    val partIdUdf = udf((id: String) => planB.value.partIdOf(id))
    val withPart = ds.toDF().withColumn("part_id", partIdUdf(col("doc_id")))

    val filtered = onlyParts match {
      case Some(parts) => withPart.where(col("part_id").isin(parts.toSeq: _*))
      case None => withPart
    }

    val routed = filtered
      .repartition(onlyParts.map(_.size).getOrElse(plan.numParts), col("part_id"))
      .sortWithinPartitions(col("part_id"), col("doc_id"))
      .select("part_id", "doc_id", "tokens", "n_tok", "source")
      .as[(Int, String, Array[Int], Int, String)]

    routed.mapPartitions { it =>
      BlockEncoder.encodePartition(
        it.map(r => (r._1, TokenRow(r._2, r._3, r._4, r._5))), o)
    }(Encoders.product[EncodedBlock])
  }

  /** Inverse transform: blocks → rows, verifying the xxhash64 checksum of
    * every block (the reference's decode-side round-trip law,
    * /root/reference/src/test/common/EncodeToolsRunner.ts:117-129).
    */
  def decode(blocks: Dataset[EncodedBlock], verify: Boolean = true): Dataset[TokenRow] = {
    val spark = blocks.sparkSession
    blocks.flatMap { b =>
      BlockEncoder.decodeBlock(b, verify)
    }(Encoders.product[TokenRow])
  }
}

object TokenCompressor {
  def apply(opts: EncodeOptions = EncodeOptions.default): TokenCompressor =
    new TokenCompressor(opts)
}

/** Executor-side block encode/decode kernels (pure functions, no Spark
  * types, so they unit-test without a session).
  */
object BlockEncoder {

  /** Groups an iterator of (part_id, row), already sorted by (part_id,
    * doc_id), into blocks of ~opts.blockTokens tokens and encodes each.
    * Lazy: holds at most one block of rows in memory.
    */
  def encodePartition(
      it: Iterator[(Int, TokenRow)],
      opts: EncodeOptions
  ): Iterator[EncodedBlock] = new Iterator[EncodedBlock] {
    private val buf = it.buffered
    private var blockSeq = 0L
    def hasNext: Boolean = buf.hasNext
    def next(): EncodedBlock = {
      val partId = buf.head._1
      val rows = scala.collection.mutable.ArrayBuffer.empty[TokenRow]
      var tok = 0L
      while (buf.hasNext && buf.head._1 == partId &&
        (rows.isEmpty || tok + buf.head._2.tokens.length <= opts.blockTokens)) {
        val r = buf.next()._2
        rows += r
        tok += r.tokens.length
      }
      val taskPart = Option(TaskContext.get()).map(_.partitionId()).getOrElse(0)
      val bid = (taskPart.toLong << 40) | blockSeq
      blockSeq += 1
      encodeBlock(partId, bid, rows.toArray, opts)
    }
  }

  def encodeBlock(
      partId: Int,
      blockId: Long,
      rows: Array[TokenRow],
      opts: EncodeOptions
  ): EncodedBlock = {
    val t0 = System.nanoTime()
    val nTok = rows.iterator.map(_.tokens.length.toLong).sum
    val flat = new Array[Int](nTok.toInt)
    var pos = 0
    rows.foreach { r =>
      System.arraycopy(r.tokens, 0, flat, pos, r.tokens.length)
      pos += r.tokens.length
    }
    val st = Analyzer.stats(flat)
    val codec = Analyzer.select(st, opts.codecPolicy)
    val codecBytes = codec.encode(flat)
    val (payload0, outer0) = Zframe.frame(codecBytes, opts.zstdLevel)
    // Hard size bound (north_rule: compressed size <= the reference
    // comparator, which is zstd/lzma over the plain canonical bytes,
    // /root/reference/src/EncodeTools.ts:1600-1661): on high-entropy blocks
    // where the lightweight codec's framed output stays above 35% of raw,
    // also try zstd(plain) and keep the smaller. Cheap blocks skip the
    // extra pass entirely.
    val (payload, outer, codecName) =
      if (opts.codecPolicy == "auto" && codec != PlainCodec &&
        payload0.length.toLong * 20 > 7L * flat.length * 4) {
        val (pp, po) = Zframe.frame(PlainCodec.encode(flat), opts.zstdLevel)
        if (pp.length < payload0.length) (pp, po, PlainCodec.name)
        else (payload0, outer0, codec.name)
      } else (payload0, outer0, codec.name)
    val checksum = Checksum.blockChecksumFlat(rows.map(_.tokens.length), flat)
    val micros = (System.nanoTime() - t0) / 1000
    EncodedBlock(
      part_id = partId,
      block_id = blockId,
      codec = codecName,
      outer = outer,
      n_docs = rows.length,
      n_tokens = nTok,
      raw_bytes = 4L * nTok + 4L * rows.length,
      encoded_bytes = payload.length.toLong,
      first_doc_id = rows.head.doc_id,
      last_doc_id = rows.last.doc_id,
      doc_ids = rows.map(_.doc_id),
      n_toks = rows.map(_.n_tok),
      sources = rows.map(_.source),
      payload = payload,
      checksum = checksum,
      enc_micros = micros
    )
  }

  def decodeBlock(b: EncodedBlock, verify: Boolean): Iterator[TokenRow] = {
    val codecBytes = Zframe.unframe(b.payload, b.outer)
    val flat = CodecRegistry.decode(b.codec, codecBytes, b.n_tokens.toInt)
    if (verify) {
      val ck = Checksum.blockChecksumFlat(b.n_toks, flat)
      require(ck == b.checksum,
        s"checksum mismatch in block ${b.block_id} (part ${b.part_id}): " +
          s"stored ${b.checksum}, decoded $ck")
    }
    val out = new Array[TokenRow](b.n_docs)
    var pos = 0
    var i = 0
    while (i < b.n_docs) {
      val n = b.n_toks(i)
      val toks = java.util.Arrays.copyOfRange(flat, pos, pos + n)
      out(i) = TokenRow(b.doc_ids(i), toks, n, b.sources(i))
      pos += n
      i += 1
    }
    out.iterator
  }
}
