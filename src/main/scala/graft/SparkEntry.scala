package graft

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent oracle wherever the semantics are
  * ANSI-SQL-expressible. Column names and row order (ORDER BY) match the
  * oracle exactly: the driver compare sorts columns by name and hashes
  * values.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** documents ∪ exact duplicates of every 20th doc (SQL-expressible on
    * both sides, so dedup oracles have real duplicates to find).
    */
  private def docsWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(
      d.where(col("doc_id") % 20 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
  }
  private val docsWithDupsSql =
    """(SELECT doc_id, text FROM documents
      | UNION ALL
      | SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0)""".stripMargin

  /** documents ∪ near-duplicates (every 10th doc with a tiny suffix) for
    * the approximate-dedup operators.
    */
  private def docsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(
      d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" zq")).as("text")))
  }

  /** Flagship: full auto-codec encode of the deterministic fixture table +
    * the lineitem-derived table, returning per-codec metrics. Exercises the
    * whole pipeline: planning, range routing, stats, cost model, all six
    * codecs, zstd framing, checksums.
    */
  def entry(spark: SparkSession): DataFrame = {
    val fixture = Fixtures.tokenTable(spark, 2000L)
    val li = TokenTables.fromLineitem(spark, "/root/testdata/sf0.001")
    val comp = TokenCompressor(EncodeOptions(numParts = 8, blockTokens = 1 << 15))
    val blocks = comp.encode(fixture.unionByName(li))
    blocks.toDF().groupBy("codec").agg(
      count(lit(1)).as("n_blocks"),
      sum("n_docs").as("n_docs"),
      sum("n_tokens").as("n_tokens"),
      sum("raw_bytes").as("raw_bytes"),
      sum("encoded_bytes").as("encoded_bytes"),
      round(sum("raw_bytes") / sum("encoded_bytes"), 2).as("ratio")
    ).orderBy("codec")
  }

  // ---------------- query catalog ----------------

  type Q = (SparkSession, String) => DataFrame

  private def rt(policy: String): Q = (s, dir) =>
    TokenTables.roundTripDigest(s, dir, policy).orderBy("doc_id")

  private val digestOracle: String =
    TokenTables.lineitemDigestOracle + "\nORDER BY doc_id"

  def queries: Map[String, Q] = Map(
    // --- codec engine: encode→decode round trips (oracle-checked) ---
    "enc_roundtrip_auto" -> rt("auto"),
    "enc_roundtrip_plain" -> rt("plain"),
    "enc_roundtrip_bitpack" -> rt("bitpack"),
    "enc_roundtrip_for" -> rt("for"),
    "enc_roundtrip_rle" -> rt("rle"),
    "enc_roundtrip_dict" -> rt("dict"),
    "enc_roundtrip_fsst" -> rt("fsst"),
    "enc_tokens_full" -> ((s, dir) => {
      val input = TokenTables.fromLineitem(s, dir)
      val comp = TokenCompressor(EncodeOptions(numParts = 8))
      comp.decode(comp.encode(input)).toDF()
        .select("doc_id", "tokens", "n_tok").orderBy(col("doc_id"), col("tokens"))
    }),
    "enc_range_read" -> ((s, dir) => {
      // encode to a manifest table, then a pruned doc_id-range read
      // (partition + block min/max pruning before any payload decode)
      val tmp = java.nio.file.Files.createTempDirectory("graft_range_q").toString
      val input = TokenTables.fromLineitem(s, dir)
      ResumableEncodeJob.run(input, tmp, EncodeOptions(numParts = 8))
      TokenTables.digest(
        RangeReader.readRange(s, tmp, "0000000100-00", "0000000400-99"))
        .orderBy("doc_id")
    }),
    "enc_block_metrics" -> ((s, dir) => {
      val input = TokenTables.fromLineitem(s, dir)
      TokenCompressor(EncodeOptions(numParts = 8)).encode(input).toDF()
        .groupBy("codec").agg(
          count(lit(1)).as("n_blocks"),
          sum("n_tokens").as("n_tokens"),
          sum("raw_bytes").as("raw_bytes"),
          sum("encoded_bytes").as("encoded_bytes"))
        .orderBy("codec")
    }),

    // --- hashing family (reference §2.2) ---
    "h_md5" -> ((s, dir) => docs(s, dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .orderBy("doc_id")),
    "h_sha256" -> ((s, dir) => docs(s, dir)
      .select(col("doc_id"), sha2(col("text").cast("binary"), 256).as("h"))
      .orderBy("doc_id")),
    "h_sha1" -> ((s, dir) => docs(s, dir)
      .select(col("doc_id"), sha1(col("text").cast("binary")).as("h"))
      .orderBy("doc_id")),
    "h_sha512" -> ((s, dir) => docs(s, dir)
      .select(col("doc_id"), sha2(col("text").cast("binary"), 512).as("h"))
      .orderBy("doc_id")),
    "h_crc32" -> ((s, dir) => docs(s, dir)
      .select(col("doc_id"), crc32(col("text").cast("binary")).as("h"))
      .orderBy("doc_id")),
    "h_xxhash64" -> ((s, dir) => docs(s, dir)
      .select(col("doc_id"), xxhash64(col("text")).as("h"))
      .orderBy("doc_id")),
    "h_xxhash32" -> ((s, dir) => {
      val u = udf((t: String) => Checksum.xxh32(t.getBytes("UTF-8")))
      docs(s, dir).select(col("doc_id"), u(col("text")).as("h")).orderBy("doc_id")
    }),
    "h_sha3" -> ((s, dir) => {
      val u = udf((t: String) => Encodings.hex(
        java.security.MessageDigest.getInstance("SHA3-512").digest(t.getBytes("UTF-8"))))
      docs(s, dir).select(col("doc_id"), u(col("text")).as("h")).orderBy("doc_id")
    }),
    "h_hashobject" -> ((s, dir) => {
      // canonicalize-then-digest (reference hashObject semantics) via the
      // native codegen expression CanonicalXxh64 (expressions.scala) —
      // cross-validated against the byte-layout hash in ChecksumSpec
      GraftFunctions.register(s)
      TokenTables.fromLineitem(s, dir).toDF()
        .select(col("doc_id"), expr("canonical_xxh64(tokens)").as("h"))
        .orderBy("doc_id")
    }),

    // --- binary encodings (reference §2.1) ---
    // NOTE: Spark 4's base64 expression emits MIME-chunked output (CRLF
    // every 76 chars); the engine's own RFC 4648 encoder matches DuckDB
    "b_base64" -> ((s, dir) => {
      val u = udf((t: String) => Encodings.base64(t.getBytes("UTF-8")))
      docs(s, dir).select(col("doc_id"), u(col("text")).as("e")).orderBy("doc_id")
    }),
    "b_hex" -> ((s, dir) => docs(s, dir)
      .select(col("doc_id"), lower(hex(col("text").cast("binary"))).as("e"))
      .orderBy("doc_id")),
    "b_base64url" -> ((s, dir) => {
      val u = udf((t: String) => Encodings.base64url(t.getBytes("UTF-8")))
      docs(s, dir).select(col("doc_id"), u(col("text")).as("e")).orderBy("doc_id")
    }),
    "b_base32" -> ((s, dir) => {
      val u = udf((t: String) => Encodings.base32(t.getBytes("UTF-8")))
      docs(s, dir).select(col("doc_id"), u(col("text")).as("e")).orderBy("doc_id")
    }),
    "b_ascii85" -> ((s, dir) => {
      val u = udf((t: String) => Encodings.ascii85(t.getBytes("UTF-8")))
      docs(s, dir).select(col("doc_id"), u(col("text")).as("e")).orderBy("doc_id")
    }),
    "b_roundtrip_all" -> ((s, dir) => {
      // decode(encode(text)) == text for every reversible encoding; emitting
      // md5 of each round-tripped payload lets DuckDB oracle-check with
      // md5(text)
      val rtUdf = udf((t: String, fmt: String) => {
        val b = t.getBytes("UTF-8")
        Encodings.dispatchDecode(fmt, Encodings.dispatchEncode(fmt, b))
      })
      val d = docs(s, dir)
      d.select(
        col("doc_id"),
        md5(rtUdf(col("text"), lit("base64"))).as("m_base64"),
        md5(rtUdf(col("text"), lit("base64url"))).as("m_base64url"),
        md5(rtUdf(col("text"), lit("hex"))).as("m_hex"),
        md5(rtUdf(col("text"), lit("base32"))).as("m_base32"),
        md5(rtUdf(col("text"), lit("ascii85"))).as("m_ascii85")
      ).orderBy("doc_id")
    }),

    // --- serialization (reference §2.4) ---
    "s_json_roundtrip" -> ((s, dir) => {
      val d = docs(s, dir)
      val j = to_json(struct(col("doc_id"), col("lang"), col("source")))
      val schema = "doc_id BIGINT, lang STRING, source STRING"
      d.select(from_json(j, org.apache.spark.sql.types.StructType.fromDDL(schema)).as("o"))
        .select(col("o.doc_id").as("doc_id"), col("o.lang").as("lang"),
          col("o.source").as("source"))
        .orderBy("doc_id")
    }),

    // --- compression (reference §2.5) ---
    "c_zstd_roundtrip" -> ((s, dir) => {
      val u = udf((t: String) =>
        Compression.zstdDecompress(Compression.zstdCompress(t.getBytes("UTF-8"), 3)))
      docs(s, dir).select(col("doc_id"), md5(u(col("text"))).as("m"))
        .orderBy("doc_id")
    }),
    "c_lzma_roundtrip" -> ((s, dir) => {
      val u = udf((t: String) =>
        Compression.lzmaDecompress(Compression.lzmaCompress(t.getBytes("UTF-8"), 6)))
      docs(s, dir).select(col("doc_id"), md5(u(col("text"))).as("m"))
        .orderBy("doc_id")
    }),
    "c_compress_ratio" -> ((s, dir) => {
      val zs = udf((t: String) => Compression.zstdCompress(t.getBytes("UTF-8"), 3).length)
      val lz = udf((t: String) => Compression.lzmaCompress(t.getBytes("UTF-8"), 6).length)
      docs(s, dir).agg(
        sum(length(col("text"))).as("raw"),
        sum(zs(col("text"))).as("zstd_bytes"),
        sum(lz(col("text"))).as("lzma_bytes"))
    }),

    // --- id generation (reference §2.3; nondeterministic => rows-only) ---
    "id_mint" -> ((s, dir) => {
      import s.implicits._
      val n = 1000
      val uuids = (1 to n).map(_ => IdGen.uuidv4String)
      val slugs = uuids.map(u => IdGen.encodeSlug(IdGen.decodeSlug(
        Encodings.base64url(java.util.UUID.fromString(u).toString.getBytes("UTF-8").take(16)))))
      Seq(
        ("uuidv4", uuids.distinct.size.toLong, uuids.head.length.toLong),
        ("nanoid", (1 to n).map(_ => IdGen.nanoid()).distinct.size.toLong, 21L),
        ("slug", slugs.distinct.size.toLong, slugs.head.length.toLong),
        ("timestamp", 1L, IdGen.timestamp.toString.length.toLong)
      ).toDF("format", "n_distinct", "len")
    }),

    // --- text analysis ---
    "t_tokcount" -> ((s, dir) => docs(s, dir)
      .select(col("doc_id"), TextOps.tokenCountCol(col("text")).as("n_words"))
      .orderBy("doc_id")),
    "t_quality" -> ((s, dir) =>
      TextOps.quality(docs(s, dir))
        .select(col("doc_id"), col("n_chars"), col("n_words"),
          round(col("chars_per_word"), 4).as("chars_per_word"),
          round(col("punct_ratio"), 4).as("punct_ratio"),
          round(col("digit_ratio"), 4).as("digit_ratio"),
          round(col("upper_ratio"), 4).as("upper_ratio"))
        .orderBy("doc_id")),
    "t_langid" -> ((s, dir) =>
      TextOps.langId(docs(s, dir)).orderBy("doc_id")),
    "t_fingerprint" -> ((s, dir) => {
      val fp = udf((t: String) => TextOps.fingerprints(t))
      docs(s, dir).select(col("doc_id"), fp(col("text")).as("fps"))
        .select(col("doc_id"), size(col("fps")).as("n_fps"),
          array_min(col("fps")).as("min_fp"))
        .orderBy("doc_id")
    }),

    // --- deduplication suite ---
    "dd_exact" -> ((s, dir) =>
      TextOps.exactDupGroups(docsWithDups(s, dir)).orderBy("h")),
    "dd_minhash" -> ((s, dir) =>
      TextOps.minhashDupPairs(docsWithNearDups(s, dir), minJaccard = 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy("doc_a", "doc_b")),
    "dd_simhash" -> ((s, dir) =>
      TextOps.simhashDupPairs(docsWithNearDups(s, dir), maxHamming = 3)
        .orderBy("doc_a", "doc_b")),
    "dd_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      // verification stage: exact 5-gram jaccard on LSH candidates
      val cands = TextOps.minhashDupPairs(docsWithNearDups(s, dir), minJaccard = 0.5)
      val texts = docsWithNearDups(s, dir)
      val j = udf((a: String, b: String) => TextOps.ngramJaccard(a, b))
      cands.join(texts.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("text", "text_a"), "doc_a")
        .join(texts.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("text", "text_b"), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(j(col("text_a"), col("text_b")), 4).as("jaccard"))
        .where(col("jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    }),

    // --- multimodal media pipeline (stubbed decode, real plumbing) ---
    "mm_metadata" -> ((s, dir) => {
      val media = docs(s, dir).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      MediaOps.withMetadata(media, col("payload"), lit("png"))
        .select(col("doc_id"), col("meta.width"), col("meta.height"),
          col("meta.format"), col("meta.n_bytes"))
        .orderBy("doc_id")
    }),
    "mm_pipeline" -> ((s, dir) => {
      val media = MediaOps.withMetadata(
        docs(s, dir).select(col("doc_id"), col("text").cast("binary").as("payload")),
        col("payload"), lit("jpeg"))
      val out = MediaOps.extractFeatures(
        MediaOps.sampleFrames(
          MediaOps.convert(
            MediaOps.adjustBrightness(
              MediaOps.crop(MediaOps.resize(media, 256, 256), 10, 10, 128, 128),
              0.25),
            "webp"),
          4))
      out.select(col("doc_id"), col("meta.width"), col("meta.height"),
        col("meta.format"), col("n_frames"),
        round(element_at(col("embedding"), 1), 4).as("f0"))
        .orderBy("doc_id")
    }),

    // --- similarity search ---
    "ann_topk" -> ((s, dir) => {
      val corpus = embs(s, dir)
      val queries = corpus.orderBy("vec_id").limit(8)
      SimSearch.bruteForceTopK(corpus, queries, k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos"), 4).as("cos"))
        .orderBy("query_id", "rank")
    }),
    "ann_lsh_pairs" -> ((s, dir) =>
      SimSearch.lshNearPairs(embs(s, dir), bits = 12, minCos = 0.9, probes = 2)
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
        .orderBy("vec_a", "vec_b")),
    "emb_norm" -> ((s, dir) => {
      val e = embs(s, dir)
      val dot = aggregate(zip_with(col("embedding"), col("embedding"),
        (p, q) => p.cast("double") * q.cast("double")), lit(0.0), (a, v) => a + v)
      e.select(col("vec_id"), round(sqrt(dot), 4).as("norm")).orderBy("vec_id")
    })
  )

  def oracleSql: Map[String, String] = {
    val langOracle: String = {
      val scores = TextOps.langStopwords.map { case (l, ws) =>
        val terms = ws.map(w =>
          s"(length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', '$w', ''))) / ${w.length}")
          .mkString(" + ")
        s"cast($terms as int) AS score_$l"
      }.mkString(",\n  ")
      val langs = TextOps.langStopwords.map(_._1)
      def caseFor(l: String): String = {
        val geAll = langs.filter(_ != l).map(o => s"score_$l >= score_$o").mkString(" AND ")
        s"WHEN $geAll AND score_$l > 0 THEN '$l'"
      }
      // earlier language wins ties: evaluate in declaration order
      s"""WITH scored AS (
         |  SELECT doc_id, $scores FROM documents
         |)
         |SELECT doc_id,
         |  CASE ${langs.map(caseFor).mkString(" ")} ELSE 'und' END AS lang_pred,
         |  ${langs.map(l => s"score_$l").mkString(", ")}
         |FROM scored ORDER BY doc_id""".stripMargin
    }
    Map(
      "enc_roundtrip_auto" -> digestOracle,
      "enc_roundtrip_plain" -> digestOracle,
      "enc_roundtrip_bitpack" -> digestOracle,
      "enc_roundtrip_for" -> digestOracle,
      "enc_roundtrip_rle" -> digestOracle,
      "enc_roundtrip_dict" -> digestOracle,
      "enc_roundtrip_fsst" -> digestOracle,
      "enc_tokens_full" ->
        """SELECT
          |  lpad(cast(l_orderkey as varchar), 10, '0') || '-' ||
          |    lpad(cast(l_linenumber as varchar), 2, '0') AS doc_id,
          |  [l_linenumber,
          |   cast(round(l_quantity) as int),
          |   cast(round(l_discount * 100) as int),
          |   cast(round(l_tax * 100) as int),
          |   cast(l_partkey % 1024 as int),
          |   cast(l_suppkey % 256 as int),
          |   ascii(l_returnflag),
          |   ascii(l_linestatus)] AS tokens,
          |  8 AS n_tok
          |FROM lineitem ORDER BY doc_id, tokens""".stripMargin,
      "h_md5" -> "SELECT doc_id, md5(text) AS h FROM documents ORDER BY doc_id",
      "h_sha256" -> "SELECT doc_id, sha256(text) AS h FROM documents ORDER BY doc_id",
      "b_base64" -> "SELECT doc_id, to_base64(encode(text)) AS e FROM documents ORDER BY doc_id",
      "b_hex" -> "SELECT doc_id, lower(hex(encode(text))) AS e FROM documents ORDER BY doc_id",
      "b_base64url" ->
        """SELECT doc_id,
          |  rtrim(replace(replace(to_base64(encode(text)), '+', '-'), '/', '_'), '=') AS e
          |FROM documents ORDER BY doc_id""".stripMargin,
      "b_roundtrip_all" ->
        """SELECT doc_id, md5(text) AS m_base64, md5(text) AS m_base64url,
          |  md5(text) AS m_hex, md5(text) AS m_base32, md5(text) AS m_ascii85
          |FROM documents ORDER BY doc_id""".stripMargin,
      "s_json_roundtrip" ->
        "SELECT doc_id, lang, source FROM documents ORDER BY doc_id",
      "c_zstd_roundtrip" ->
        "SELECT doc_id, md5(text) AS m FROM documents ORDER BY doc_id",
      "c_lzma_roundtrip" ->
        "SELECT doc_id, md5(text) AS m FROM documents ORDER BY doc_id",
      "t_tokcount" ->
        """SELECT doc_id,
          |  CASE WHEN length(trim(text)) = 0 THEN 0
          |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words
          |FROM documents ORDER BY doc_id""".stripMargin,
      "t_quality" ->
        """SELECT doc_id,
          |  length(text) AS n_chars,
          |  CASE WHEN length(trim(text)) = 0 THEN 0
          |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words,
          |  round(cast(length(text) as double) / greatest(
          |    CASE WHEN length(trim(text)) = 0 THEN 0
          |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1), 4) AS chars_per_word,
          |  round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
          |    / greatest(cast(length(text) as double), 1.0), 4) AS punct_ratio,
          |  round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
          |    / greatest(cast(length(text) as double), 1.0), 4) AS digit_ratio,
          |  round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
          |    / greatest(cast(length(text) as double), 1.0), 4) AS upper_ratio
          |FROM documents ORDER BY doc_id""".stripMargin,
      "t_langid" -> langOracle,
      "enc_range_read" ->
        s"""SELECT * FROM (${TokenTables.lineitemDigestOracle}) d
           |WHERE doc_id BETWEEN '0000000100-00' AND '0000000400-99'
           |ORDER BY doc_id""".stripMargin,
      "emb_norm" ->
        """SELECT vec_id,
          |  round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4) AS norm
          |FROM embeddings ORDER BY vec_id""".stripMargin,
      "ann_topk" ->
        """WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings ORDER BY vec_id LIMIT 8),
          |s AS (
          |  SELECT q.qid query_id, c.vec_id neighbor_id,
          |         list_cosine_similarity(q.qe::DOUBLE[], c.embedding::DOUBLE[]) cos
          |  FROM q CROSS JOIN embeddings c WHERE c.vec_id != q.qid),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) rank FROM s)
          |SELECT query_id, cast(rank as int) AS rank, neighbor_id, round(cos, 4) AS cos
          |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
      "dd_exact" ->
        s"""SELECT md5(text) AS h, count(*) AS cnt, min(doc_id) AS keep_doc_id
           |FROM $docsWithDupsSql u
           |GROUP BY 1 HAVING count(*) > 1 ORDER BY h""".stripMargin
    )
  }
}
