package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Encoders
import java.nio.file.Files

/** Stream-batch compaction: micro-batch block dirs fold into the table's
  * part_id layout (one immutable `compacted/run=V` dir per invocation)
  * behind the same atomic-snapshot commit every other writer uses. Content
  * is preserved exactly; block sizes and clustering recover to batch-encode
  * quality; crashes at any point leave no duplicate or missing rows.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def batchRows(from: Long, to: Long) =
    spark.range(from, to)
      .mapPartitions(_.map(i => Fixtures.row(42L, i)))(Encoders.product[TokenRow])

  private def decodedMap(table: String): Map[String, Seq[Int]] =
    StreamingEncode.readDecoded(spark, table)
      .collect().map(r => r.doc_id -> r.tokens.toSeq).toMap

  private def fs(table: String) = ManifestIO.fs(spark, table)
  private def batchDir(table: String, b: Long) =
    new org.apache.hadoop.fs.Path(s"$table/stream_batches/batch=$b")

  test("compaction preserves content, shrinks block count, deletes batch dirs") {
    val root = Files.createTempDirectory("graft_compact").toString
    val table = s"$root/t"
    // small blockTokens + 3 micro-batches → many undersized stream blocks
    val opts = EncodeOptions(numParts = 4, blockTokens = 1 << 12)
    StreamingEncode.appendBatch(batchRows(0, 300), table, opts, batchId = 0L)
    StreamingEncode.appendBatch(batchRows(300, 600), table, opts, batchId = 1L)
    StreamingEncode.appendBatch(batchRows(600, 900), table, opts, batchId = 2L)

    val before = decodedMap(table)
    val streamBlocks = StreamingEncode.readCommittedBlocks(spark, table).count()

    val snap = StreamingEncode.compact(spark, table,
      opts.copy(blockTokens = 1 << 16))
    assert(snap.compactedBatchId.contains(2L))
    assert(snap.compactedRuns.nonEmpty)
    // source batch dirs are gone; the run dir carries the part_id layout
    (0L to 2L).foreach(b => assert(!fs(table).exists(batchDir(table, b))))
    val runDir = ManifestIO.compactedDir(table, snap.compactedRuns.last)
    assert(fs(table).exists(runDir))
    assert(fs(table).listStatus(runDir).exists(_.getPath.getName.startsWith("part_id=")))

    // content identical, block count collapsed (bigger blocks, one layout)
    assert(decodedMap(table) == before)
    val compactBlocks = StreamingEncode.readCommittedBlocks(spark, table).count()
    assert(compactBlocks < streamBlocks,
      s"expected fewer blocks after compaction: $compactBlocks vs $streamBlocks")

    // range reads prune into the compacted layout (same routing law)
    val probe = before.keysIterator.next()
    val hit = RangeReader.lookup(spark, table, probe).collect()
    assert(hit.length == 1 && hit.head.tokens.toSeq == before(probe))

    // nothing pending → no-op, no new snapshot
    val again = StreamingEncode.compact(spark, table, opts)
    assert(again.version == snap.version)
  }

  test("ingest continues after compaction; second run compacts only the tail") {
    val root = Files.createTempDirectory("graft_compact2").toString
    val table = s"$root/t"
    val opts = EncodeOptions(numParts = 4, blockTokens = 1 << 12)
    StreamingEncode.appendBatch(batchRows(0, 250), table, opts, batchId = 0L)
    val s1 = StreamingEncode.compact(spark, table, opts)

    StreamingEncode.appendBatch(batchRows(250, 500), table, opts, batchId = 1L)
    // mixed state: one compacted run + one live batch dir
    assert(decodedMap(table).size == 500)

    val s2 = StreamingEncode.compact(spark, table, opts)
    assert(s2.compactedBatchId.contains(1L))
    assert(s2.compactedRuns == s1.compactedRuns :+ s2.version)
    assert(!fs(table).exists(batchDir(table, 1L)))
    val expected = batchRows(0, 500).collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    assert(decodedMap(table) == expected)
  }

  test("crash artifacts are swept: orphan run dir and leftover batch dir") {
    val root = Files.createTempDirectory("graft_compact3").toString
    val table = s"$root/t"
    val opts = EncodeOptions(numParts = 4, blockTokens = 1 << 12)
    StreamingEncode.appendBatch(batchRows(0, 200), table, opts, batchId = 0L)

    // a compaction that died after writing its run dir but before commit:
    // the dir exists, no snapshot references it
    val orphan = ManifestIO.compactedDir(table, 99)
    fs(table).mkdirs(orphan)
    val s1 = StreamingEncode.compact(spark, table, opts)
    assert(!fs(table).exists(orphan), "unreferenced run dir must be swept")
    assert(s1.compactedRuns == Seq(s1.version))

    // a compaction that died after commit but before batch-dir cleanup:
    // recreate the (already invisible) batch dir — readers skip it, the
    // next compaction deletes it without recompacting
    fs(table).mkdirs(batchDir(table, 0L))
    assert(decodedMap(table).size == 200, "watermarked batch dir must be invisible")
    StreamingEncode.appendBatch(batchRows(200, 400), table, opts, batchId = 1L)
    val s2 = StreamingEncode.compact(spark, table, opts)
    assert(!fs(table).exists(batchDir(table, 0L)), "leftover dir must be swept")
    assert(s2.compactedRuns.size == 2)
    assert(decodedMap(table).size == 400)
  }
}
