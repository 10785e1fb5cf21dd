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

  test("stream lineage carries the full batch fields (checksum_xor, codecs)") {
    val root = Files.createTempDirectory("graft_stream_lin").toString
    val opts = EncodeOptions(numParts = 4)
    val input = Fixtures.tokenTable(spark, 400L)

    // batch-encoded reference table over the identical input
    ResumableEncodeJob.run(input, s"$root/batch_table", opts)
    val batchLin = ManifestIO.latest(spark, s"$root/batch_table").get.lineage
      .values.filter(_.part_id >= 0)

    // same input through ONE streaming micro-batch
    input.toDF().coalesce(1).write.mode("append").parquet(s"$root/in")
    StreamingEncode.start(spark, s"$root/in", s"$root/stream_table", opts)
      .awaitTermination()
    val sl = ManifestIO.latest(spark, s"$root/stream_table").get.lineage(-1)

    assert(sl.n_blocks == batchLin.map(_.n_blocks).sum)
    assert(sl.n_docs == batchLin.map(_.n_docs).sum)
    assert(sl.n_tokens == batchLin.map(_.n_tokens).sum)
    assert(sl.raw_bytes == batchLin.map(_.raw_bytes).sum)
    assert(sl.encoded_bytes == batchLin.map(_.encoded_bytes).sum)
    // identical plan + identical rows => identical blocks: the stream's
    // xor-of-checksums and codec mix must equal the batch table's
    assert(sl.checksum_xor == batchLin.map(_.checksum_xor).reduce(_ ^ _))
    assert(sl.codecs.nonEmpty)
    val batchCodecs = batchLin.flatMap(_.codecs).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(sl.codecs == batchCodecs)
  }

  test("watermarked event-time window stream converges to the batch aggregation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // phase-driven arrival (write -> AvailableNow run -> repeat) so event
    // time rises monotonically across runs: no late-data drops, and the
    // watermark persisted in the checkpoint closes earlier windows exactly
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val all = (0 until 200).map { i =>
      (i.toLong, new java.sql.Timestamp(base + i * 90000L), s"t${i % 3}")
    }
    val phases = Seq(
      all.filter(_._2.getTime < base + 5400000L), // [0h, 1.5h)
      all.filter(r => r._2.getTime >= base + 5400000L && r._2.getTime < base + 10800000L),
      all.filter(_._2.getTime >= base + 10800000L))
    val dir = java.nio.file.Files.createTempDirectory("graft_evstream").toString
    val schema = phases.head.toDF("event_id", "ts", "event_type").schema
    phases.zipWithIndex.foreach { case (rows, phase) =>
      rows.toDF("event_id", "ts", "event_type")
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
      val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour")).count()
      val q = stream.writeStream
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.select(col("window.start").cast("string"), col("count"))
            .collect().map(r => r.getString(0) -> r.getLong(1))
          StreamingSpec.emitted.synchronized { StreamingSpec.emitted ++= rows }
          ()
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val got = StreamingSpec.emitted.synchronized { StreamingSpec.emitted.toMap }
    val batch = all.toDF("event_id", "ts", "event_type")
      .groupBy(window(col("ts"), "1 hour")).count()
      .select(col("window.start").cast("string"), col("count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // windows fully below the phase-2 watermark (2.5h) MUST be out, complete
    Seq("2024-01-01 00:00:00", "2024-01-01 01:00:00").foreach { w =>
      assert(got.get(w).contains(batch(w)), s"window $w must be emitted complete")
    }
    // and nothing fabricated or partial: every emitted window == batch count
    got.foreach { case (w, c) => assert(batch.get(w).contains(c), s"window $w") }
  }
}

object StreamingSpec {
  // shared sink for the foreachBatch watermark test (checkpointed streams
  // cannot use the memory sink)
  val emitted: scala.collection.mutable.ArrayBuffer[(String, Long)] =
    scala.collection.mutable.ArrayBuffer.empty
}
