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
}
