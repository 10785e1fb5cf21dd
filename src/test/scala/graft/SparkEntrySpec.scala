package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; every query runs on
  * sf0.001 and returns a sane schema; oracle keys reference real queries.
  */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry returns non-empty codec metrics") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(df.columns.contains("codec") && df.columns.contains("ratio"))
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("a representative sample of queries executes with rows > 0") {
    val sample = Seq("enc_roundtrip_auto", "h_md5", "b_roundtrip_all",
      "dd_exact", "t_langid", "ann_topk", "c_lzma_roundtrip")
    sample.foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("JSONL and CSV source adapters round-trip the token table") {
    import org.apache.spark.sql.Encoders
    val spark2 = SparkTestSession.spark
    val rows = (0 until 200).map { i =>
      TokenRow(f"j$i%04d", Array.tabulate(i % 7)(j => i * 31 + j), i % 7, s"s${i % 3}")
    }
    val ds = spark2.createDataset(rows)(Encoders.product[TokenRow])
    val dir = java.nio.file.Files.createTempDirectory("graft_srcfmt").toString
    TokenTables.toJsonl(ds, s"$dir/jsonl")
    val backJ = TokenTables.fromJsonl(spark2, s"$dir/jsonl")
      .collect().map(r => r.doc_id -> (r.tokens.toSeq, r.n_tok, r.source)).toMap
    assert(backJ == rows.map(r => r.doc_id -> (r.tokens.toSeq, r.n_tok, r.source)).toMap)
    TokenTables.toCsv(ds, s"$dir/csv")
    val backC = TokenTables.fromCsv(spark2, s"$dir/csv")
      .collect().map(r => r.doc_id -> (r.tokens.toSeq, r.n_tok, r.source)).toMap
    assert(backC == rows.map(r => r.doc_id -> (r.tokens.toSeq, r.n_tok, r.source)).toMap)
    // and the engine consumes either source directly
    val comp = TokenCompressor(EncodeOptions(numParts = 2, blockTokens = 64))
    val dec = comp.decode(comp.encode(TokenTables.fromJsonl(spark2, s"$dir/jsonl")))
      .collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    assert(dec == rows.map(r => r.doc_id -> r.tokens.toSeq).toMap)
  }
}
