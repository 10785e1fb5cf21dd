package graft

import org.scalatest.funsuite.AnyFunSuite

/** Precision side of the dedup/ANN oracles (round-2 verdict item 3): the
  * driver queries now admit every pair touching a planted
  * disjoint-vocabulary decoy, so any false positive fails the oracle
  * compare. This spec asserts the decoy side is empty at sf0.001 directly,
  * and that recall rows are still present.
  */
class PrecisionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Array[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))

  test("dd_minhash: planted pairs recalled, zero decoy pairs") {
    val ps = rows("dd_minhash")
    assert(ps.nonEmpty)
    assert(ps.forall { case (a, b) => b == a + 2000000L && a < 3000000L },
      s"decoy or stray pair: ${ps.filterNot(p => p._2 == p._1 + 2000000L).toSeq}")
  }

  test("dd_simhash: planted pairs recalled, zero decoy pairs") {
    val ps = rows("dd_simhash")
    assert(ps.nonEmpty)
    assert(ps.forall { case (a, b) => b == a + 1000000L && a < 3000000L })
  }

  test("dd_ngram_jaccard: verify stage rejects all decoy candidates") {
    val ps = rows("dd_ngram_jaccard")
    assert(ps.nonEmpty)
    assert(ps.forall { case (a, b) => b == a + 2000000L && a < 3000000L })
  }

  test("ann_lsh_pairs: planted pairs recalled, zero decoy pairs") {
    val ps = SparkEntry.queries("ann_lsh_pairs")(spark, dir)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ps.nonEmpty)
    assert(ps.forall { case (a, b) => b == a + 1000000L && a < 2000000L })
  }

  test("ann_ivf: planted queries survive, decoy queries eliminated by the cos gate") {
    val qs = SparkEntry.queries("ann_ivf")(spark, dir)
      .select("query_id").collect().map(_.getLong(0))
    assert(qs.nonEmpty)
    assert(qs.forall(q => q >= 1000000L && q < 2000000L),
      s"decoy query leaked through the >=0.99 gate: ${qs.filter(_ >= 2000000L).toSeq}")
  }

  test("capped operators surface dropped_pairs = 0 when the cap never fires") {
    for (n <- Seq("dd_minhash", "dd_simhash", "ann_lsh_pairs")) {
      val d = SparkEntry.queries(n)(spark, dir)
        .select("dropped_pairs").head().getLong(0)
      assert(d == 0L, s"$n reports dropped_pairs=$d on uncapped data")
    }
  }
}
