package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Table-level symbol reuse (SURVEY §7.3 deferred item, VERDICT round-1
  * item 10): dict/fsst tables split into their own column, trained once per
  * run of blocks, byte-identical across the run (=> Parquet dictionary
  * stores them once), blocks still independently decodable.
  */
class TableReuseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val rng = new scala.util.Random(11)

  test("dict: split encode/decode round-trips; cache miss fails closed") {
    val a = Array.fill(5000)(rng.nextInt(500) * 3)
    val dict = DictCodec.train(a)
    val body = DictCodec.encodeWith(dict, a).get
    assert(DictCodec.decodeWith(DictCodec.tableBytes(dict), body, a.length).toSeq == a.toSeq)
    // a value outside the trained dictionary must refuse, not corrupt
    val b = a.clone(); b(17) = 500 * 3 + 1
    assert(DictCodec.encodeWith(dict, b).isEmpty)
    // split wire format == monolithic wire format
    assert((DictCodec.tableBytes(dict) ++ body).toSeq == DictCodec.encode(a).toSeq)
  }

  test("fsst: reuse path round-trips and matches the monolithic format") {
    val pattern = Array(3, 1, 4, 1, 5, 9, 2, 6)
    val a = Array.tabulate(20000)(i => pattern(i % 8))
    val t = FsstCodec.train(a)
    val body = FsstCodec.encodeWith(t, a).get
    assert(FsstCodec.decodeWith(FsstCodec.tableBytes(t), body, a.length).toSeq == a.toSeq)
    // reuse on a DIFFERENT block with the same distribution still round-trips
    val b = Array.tabulate(15000)(i => pattern((i + 3) % 8))
    val bodyB = FsstCodec.encodeWith(t, b).get
    assert(FsstCodec.decodeWith(FsstCodec.tableBytes(t), bodyB, b.length).toSeq == b.toSeq)
    // and still compresses (the table actually applies)
    assert(bodyB.length < b.length * 4 / 4 / 2, "reused table keeps compressing")
    assert((FsstCodec.tableBytes(t) ++ body).toSeq == FsstCodec.encode(a).toSeq)
  }

  test("engine: consecutive blocks share byte-identical symtabs, decode bit-exact") {
    import org.apache.spark.sql.Encoders
    val ds = Fixtures.tokenTable(spark, 1200L)
    val opts = EncodeOptions(numParts = 2, blockTokens = 1 << 13)
    val blocks = TokenCompressor(opts).encode(ds).collect()
    val tabular = blocks.filter(b => b.codec == "dict" || b.codec == "fsst2")
    assert(tabular.nonEmpty, "fixture must exercise table codecs")
    tabular.foreach(b => assert(b.symtab.nonEmpty))
    val distinctTabs = tabular.map(_.symtab.toSeq).distinct.length
    assert(distinctTabs < tabular.length,
      s"reuse must dedupe tables: $distinctTabs distinct of ${tabular.length}")
    // amortized accounting: reused blocks do not re-count their table
    val reused = tabular.groupBy(_.symtab.toSeq).exists(_._2.length > 1)
    assert(reused)
    // bit-exact decode through the symtab path
    val back = TokenCompressor(opts)
      .decode(spark.createDataset(blocks.toIndexedSeq)(Encoders.product[EncodedBlock]))
      .collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    val orig = ds.collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    assert(back == orig)
  }

  test("engine: tableReuse=false still writes self-describing symtab blocks") {
    import org.apache.spark.sql.Encoders
    val ds = Fixtures.tokenTable(spark, 300L)
    val opts = EncodeOptions(numParts = 2, blockTokens = 1 << 13, tableReuse = false)
    val blocks = TokenCompressor(opts).encode(ds).collect()
    blocks.foreach { b =>
      assert(b.symtab != null && b.symtab.isEmpty, "no-reuse mode embeds tables in payload")
    }
    val back = TokenCompressor(opts)
      .decode(spark.createDataset(blocks.toIndexedSeq)(Encoders.product[EncodedBlock]))
      .collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    assert(back == ds.collect().map(r => r.doc_id -> r.tokens.toSeq).toMap)
  }

  test("quality guard: degenerate cached dict is not reused") {
    // huge cached dict vs tiny-range block: bit width would balloon -> retrain
    val wide = DictCodec.train(Array.tabulate(4096)(i => i * 7))
    val narrowStats = Analyzer.stats(Array.fill(1000)(7))
    assert(!DictCodec.reusable(wide, narrowStats))
    // compatible block (same code width) reuses fine
    val sameStats = Analyzer.stats(Array.tabulate(5000)(i => (i % 4000) * 7))
    assert(DictCodec.reusable(wide, sameStats))
    // smaller-vocabulary block would widen codes under the cached dict -> no
    val narrower = Analyzer.stats(Array.tabulate(1000)(i => (i % 900) * 7))
    assert(!DictCodec.reusable(wide, narrower))
  }
}
