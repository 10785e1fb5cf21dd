package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class RangeReaderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("range read returns exactly the rows in range, touching only candidate parts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_range").toString
    val opts = EncodeOptions(numParts = 16)
    val input = Fixtures.tokenTable(spark, 2000L)
    ResumableEncodeJob.run(input, s"$dir/t", opts)

    // a range inside one source prefix
    val from = "small_alpha-0000000000"
    val to = "small_alpha-0000000500"
    val got = RangeReader.readRange(spark, s"$dir/t", from, to)
      .collect().map(_.doc_id).sorted
    val want = input.collect().map(_.doc_id)
      .filter(id => id >= from && id <= to).sorted
    assert(got.sameElements(want))
    assert(got.nonEmpty)

    // pruning: candidate parts must be a strict subset for a narrow range
    val snap = ManifestIO.latest(spark, s"$dir/t").get
    val cand = RangeReader.candidateParts(snap.plan, from, to)
    assert(cand.size < snap.plan.numParts,
      s"no pruning: ${cand.size} of ${snap.plan.numParts}")
    // blocks actually read come only from candidate parts
    val partsTouched = RangeReader.rangeBlocks(spark, s"$dir/t", from, to)
      .select("part_id").distinct().as[Int].collect().toSet
    assert(partsTouched.subsetOf(cand.toSet))

    // degenerate ranges
    assert(RangeReader.readRange(spark, s"$dir/t", "zzzz", "zzzz2").count() == 0)
    val one = RangeReader.readRange(spark, s"$dir/t", got.head, got.head).collect()
    assert(one.length == 1 && one.head.doc_id == got.head)
  }

  test("point lookup returns exactly the doc and prunes to its partition") {
    import org.apache.spark.sql.Encoders
    val rows = (0 until 200).map(i => TokenRow(f"doc$i%04d", Array(i, i + 1), 2, "s"))
    val ds = spark.createDataset(rows)(Encoders.product[TokenRow])
    val dir = java.nio.file.Files.createTempDirectory("graft_lookup").toString
    ResumableEncodeJob.run(ds, dir, EncodeOptions(numParts = 8, blockTokens = 32))
    val got = RangeReader.lookup(spark, dir, "doc0137").collect()
    assert(got.length == 1 && got.head.tokens.toSeq == Seq(137, 138))
    assert(RangeReader.lookup(spark, dir, "missing").collect().isEmpty)
    // pruning: candidate parts for a point is a single bucket's salt span
    val snap = ManifestIO.latest(spark, dir).get
    val cands = RangeReader.candidateParts(snap.plan, "doc0137", "doc0137")
    assert(cands.length < snap.plan.numParts)
  }

  test("range decode pushdown agrees with full decode across every codec policy") {
    import org.apache.spark.sql.Encoders
    val rng = new scala.util.Random(23)
    Seq("plain", "bitpack", "for", "dict", "rle", "fsst", "auto").foreach { policy =>
      val rows = (0 until 300).map { i =>
        val toks = Array.fill(20 + rng.nextInt(30))(rng.nextInt(800))
        TokenRow(f"k$i%05d", toks, toks.length, "s")
      }
      val ds = spark.createDataset(rows)(Encoders.product[TokenRow])
      val dir = java.nio.file.Files.createTempDirectory(s"graft_slice_$policy").toString
      ResumableEncodeJob.run(ds, dir,
        EncodeOptions(codecPolicy = policy, numParts = 3, blockTokens = 1 << 10))
      val got = RangeReader.readRange(spark, dir, "k00050", "k00149")
        .collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
      val want = rows.filter(r => r.doc_id >= "k00050" && r.doc_id <= "k00149")
        .map(r => r.doc_id -> r.tokens.toSeq).toMap
      assert(got == want, s"policy $policy")
    }
  }

  test("range reads include the committed stream-batch tail (mid-ingest table)") {
    import org.apache.spark.sql.Encoders
    val root = Files.createTempDirectory("graft_tail").toString
    val table = s"$root/t"
    val opts = EncodeOptions(numParts = 4)
    val wave1 = Fixtures.tokenTable(spark, 300L)
    StreamingEncode.appendBatch(wave1, table, opts, batchId = 0L)
    val ids = wave1.collect().map(_.doc_id).sorted

    // mid-ingest, nothing compacted: the tail is the ONLY data — a point
    // lookup and a range read must still see it (pre-fix they returned
    // empty while StreamingEncode.readDecoded returned the rows)
    val one = RangeReader.lookup(spark, table, ids(10)).collect()
    assert(one.length == 1 && one.head.doc_id == ids(10))
    val want1 = ids.filter(id => id >= ids(10) && id <= ids(40)).toSeq
    val got1 = RangeReader.readRange(spark, table, ids(10), ids(40))
      .collect().map(_.doc_id).sorted.toSeq
    assert(got1 == want1)

    // after compaction plus a NEW uncompacted batch, a spanning read sees
    // compacted runs and the fresh tail together
    StreamingEncode.compact(spark, table, opts)
    val wave2 = spark.range(300, 500)
      .mapPartitions(_.map(i => Fixtures.row(42L, i)))(Encoders.product[TokenRow])
    StreamingEncode.appendBatch(wave2, table, opts, batchId = 1L)
    val allIds = (ids ++ wave2.collect().map(_.doc_id)).sorted
    val got2 = RangeReader.readRange(spark, table, allIds.head, allIds.last)
      .collect().map(_.doc_id).sorted.toSeq
    assert(got2 == allIds.toSeq)

    // SPARSE batch ids (appendBatch accepts arbitrary, e.g. time-derived,
    // ids): tail discovery must come from one directory listing — the old
    // per-id exists() probe over (watermark, streamBatchId] would scan
    // ~5 billion candidate ids here and never finish (ADVICE r6)
    val wave3 = spark.range(500, 600)
      .mapPartitions(_.map(i => Fixtures.row(42L, i)))(Encoders.product[TokenRow])
    StreamingEncode.appendBatch(wave3, table, opts, batchId = 5000000000L)
    val allIds3 = (allIds ++ wave3.collect().map(_.doc_id)).sorted
    val got3 = RangeReader.readRange(spark, table, allIds3.head, allIds3.last)
      .collect().map(_.doc_id).sorted.toSeq
    assert(got3 == allIds3.toSeq)
    // compaction's pending-batch discovery takes the same listed path
    StreamingEncode.compact(spark, table, opts)
    val got4 = RangeReader.readRange(spark, table, allIds3.head, allIds3.last)
      .collect().map(_.doc_id).sorted.toSeq
    assert(got4 == allIds3.toSeq)
  }
}
