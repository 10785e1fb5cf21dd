package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Encoders
import java.nio.file.Files

/** Streaming ingestion: files arriving over time are encoded per
  * micro-batch, committed idempotently, and decode back bit-identical.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("file-stream encode: two waves of files, decode equals input") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_stream").toString
    val in = s"$root/in"
    val table = s"$root/table"
    val opts = EncodeOptions(numParts = 4)

    val wave1 = Fixtures.tokenTable(spark, 300L)
    wave1.toDF().coalesce(1).write.mode("append").parquet(in)
    val q1 = StreamingEncode.start(spark, in, table, opts)
    q1.awaitTermination()

    // wave 2: rows 300..500 (distinct ids via a shifted seed-range trick)
    val wave2 = spark.range(300, 500)
      .mapPartitions(_.map(i => Fixtures.row(42L, i)))(Encoders.product[TokenRow])
    wave2.toDF().coalesce(1).write.mode("append").parquet(in)
    val q2 = StreamingEncode.start(spark, in, table, opts)
    q2.awaitTermination()

    val snap = ManifestIO.latest(spark, table).get
    assert(snap.streamBatchId.isDefined)
    assert(snap.lineage(-1).n_docs == 500L)

    val decoded = StreamingEncode.readDecoded(spark, table)
    val expected = Fixtures.tokenTable(spark, 500L)
    val joined = decoded.as("d")
      .joinWith(expected.as("i"), $"d.doc_id" === $"i.doc_id", "full_outer")
    val bad = joined.filter { case (d, i) =>
      d == null || i == null || !d.tokens.sameElements(i.tokens)
    }.count()
    assert(bad == 0)
    assert(decoded.count() == 500L)

    // replayed batch id is a no-op (idempotence)
    val before = ManifestIO.latest(spark, table).get.version
    StreamingEncode.appendBatch(wave1, table, opts, batchId = 0L)
    assert(ManifestIO.latest(spark, table).get.version == before)
  }
}
