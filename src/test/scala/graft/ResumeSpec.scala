package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Resumability (north_rule): an interrupted run continues from the last
  * committed snapshot, re-encoding only uncommitted partitions, and the
  * final table is identical to an uninterrupted run.
  */
class ResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("batched runs resume from last snapshot and converge to identical table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_resume").toString
    val opts = EncodeOptions(numParts = 12)
    val input = Fixtures.tokenTable(spark, 1200L)

    // interrupted run: 5 parts per invocation
    val s1 = ResumableEncodeJob.run(input, s"$dir/t1", opts, maxPartsPerRun = 5)
    assert(s1.committed.size == 5 && s1.version == 1)
    val s2 = ResumableEncodeJob.run(input, s"$dir/t1", opts, maxPartsPerRun = 5)
    assert(s2.committed.size == 10 && s2.version == 2)
    // only 5 new parts were encoded in run 2
    assert((s2.committed -- s1.committed).size == 5)
    assert(s2.lineage.keySet.intersect(s1.committed) == s1.committed,
      "run 2 must keep run 1 lineage untouched")
    s1.committed.foreach { p =>
      assert(s2.lineage(p) == s1.lineage(p), s"lineage of committed part $p changed")
    }
    val s3 = ResumableEncodeJob.run(input, s"$dir/t1", opts)
    assert(s3.committed.size == s3.plan.numParts)
    // idempotent once complete
    val s4 = ResumableEncodeJob.run(input, s"$dir/t1", opts)
    assert(s4.version == s3.version)

    // uninterrupted run for comparison
    val u = ResumableEncodeJob.run(input, s"$dir/t2", opts)
    assert(u.committed == s3.committed)

    // decoded tables identical to the input (and hence to each other)
    val comp = TokenCompressor(opts)
    for (t <- Seq("t1", "t2")) {
      val blocks = ResumableEncodeJob.readBlocks(spark, s"$dir/$t")
      val dec = comp.decode(blocks)
      val joined = dec.as("d").joinWith(input.as("i"), $"d.doc_id" === $"i.doc_id", "full_outer")
      val bad = joined.filter { case (d, i) =>
        d == null || i == null || !d.tokens.sameElements(i.tokens)
      }.count()
      assert(bad == 0, s"$t: $bad mismatching rows")
      assert(dec.count() == 1200L)
    }

    // determinism: same parts encode to the same per-part checksum_xor
    s3.lineage.foreach { case (pid, l) =>
      assert(u.lineage(pid).checksum_xor == l.checksum_xor, s"part $pid differs")
      assert(u.lineage(pid).n_tokens == l.n_tokens)
    }

    // time travel: snapshot v1 sees exactly the first 5 parts' docs
    val v1Blocks = ResumableEncodeJob.readBlocks(spark, s"$dir/t1", Some(1))
    val v1Docs = v1Blocks.collect().map(_.n_docs.toLong).sum
    assert(v1Docs == s1.lineage.values.map(_.n_docs).sum)
    assert(v1Docs < 1200L)
    assert(ManifestIO.at(spark, s"$dir/t1", 99).isEmpty)
  }

  test("stale uncommitted files are cleaned before re-encode") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stale").toString
    val opts = EncodeOptions(numParts = 4)
    val input = Fixtures.tokenTable(spark, 200L)
    val s1 = ResumableEncodeJob.run(input, s"$dir/t", opts, maxPartsPerRun = 2)
    // simulate a crashed job that left files for an uncommitted part
    val pending = (0 until s1.plan.numParts).filterNot(s1.committed).head
    val staleDir = new java.io.File(s"$dir/t/data/part_id=$pending")
    staleDir.mkdirs()
    val stale = new java.io.File(staleDir, "part-stale.parquet")
    // a valid-but-stale parquet: copy one from a committed part
    val committedDir = new java.io.File(s"$dir/t/data/part_id=${s1.committed.head}")
    val src = committedDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.copy(src.toPath, stale.toPath)

    val s2 = ResumableEncodeJob.run(input, s"$dir/t", opts)
    assert(s2.committed.size == s2.plan.numParts)
    val dec = TokenCompressor(opts).decode(ResumableEncodeJob.readBlocks(spark, s"$dir/t"))
    assert(dec.count() == 200L, "stale file must not produce duplicate rows")
  }

  test("zero-row input commits an empty snapshot and reads back empty") {
    import org.apache.spark.sql.Encoders
    val empty = spark.createDataset(Seq.empty[TokenRow])(Encoders.product[TokenRow])
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_tbl").toString
    val snap = ResumableEncodeJob.run(empty, dir, EncodeOptions(numParts = 4))
    assert(snap.version == 1, "first batch must COMMIT even with zero blocks")
    assert(snap.committed == (0 until snap.plan.numParts).toSet)
    assert(snap.lineage.isEmpty)
    assert(ResumableEncodeJob.readBlocks(spark, dir).count() == 0)
    // a rerun is a no-op, not a recrash
    val again = ResumableEncodeJob.run(empty, dir, EncodeOptions(numParts = 4))
    assert(again.version == 1)
  }

  test("migrate: resumable policy migration, bit-exact, narrow, new codec") {
    import org.apache.spark.sql.Encoders
    val input = Fixtures.tokenTable(spark, 600L)
    val src = java.nio.file.Files.createTempDirectory("graft_mig_src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_mig_dst").toString
    ResumableEncodeJob.run(input, src, EncodeOptions(numParts = 6, blockTokens = 1 << 13))
    // interrupted migration: 2 parts per run -> 3 runs to converge
    val s1 = ResumableEncodeJob.migrate(spark, src, dst,
      EncodeOptions(codecPolicy = "plain"), maxPartsPerRun = 2)
    assert(s1.committed.size == 2)
    val s2 = ResumableEncodeJob.migrate(spark, src, dst,
      EncodeOptions(codecPolicy = "plain"), maxPartsPerRun = 2)
    assert(s2.committed.size == 4)
    val s3 = ResumableEncodeJob.migrate(spark, src, dst,
      EncodeOptions(codecPolicy = "plain"))
    assert(s3.committed.size == 6)
    // idempotent once converged
    assert(ResumableEncodeJob.migrate(spark, src, dst,
      EncodeOptions(codecPolicy = "plain")).version == s3.version)
    val dstBlocks = ResumableEncodeJob.readBlocks(spark, dst)
    assert(dstBlocks.collect().forall(_.codec == "plain"))
    val back = TokenCompressor(EncodeOptions())
      .decode(dstBlocks).collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    assert(back == input.collect().map(r => r.doc_id -> r.tokens.toSeq).toMap)
    // lineage totals preserved (tokens/docs identical, codec mix now plain)
    val srcSnap = ManifestIO.latest(spark, src).get
    assert(s3.lineage.values.map(_.n_tokens).sum == srcSnap.lineage.values.map(_.n_tokens).sum)
    assert(s3.lineage.values.flatMap(_.codecs.keys).toSet == Set("plain"))
  }

  test("pre-zdict block tables (no zdict column) read back and decode") {
    // Tables written before EncodedBlock gained `zdict` lack the column on
    // disk; every reader passes the explicit encoder schema, so the column
    // must surface as null and decode must treat that as dict-less.
    val input = Fixtures.tokenTable(spark, 300L)
    val dir = java.nio.file.Files.createTempDirectory("graft_prezdict").toString
    ResumableEncodeJob.run(input, dir, EncodeOptions(numParts = 3))
    // strip the zdict column in place, emulating the legacy layout
    val dataDir = ManifestIO.dataDir(dir).toString
    val legacy = spark.read.parquet(dataDir).drop("zdict")
    val tmp = java.nio.file.Files.createTempDirectory("graft_prezdict_tmp").toString
    legacy.write.partitionBy("part_id").parquet(s"$tmp/data")
    val f = ManifestIO.fs(spark, dir)
    f.delete(new org.apache.hadoop.fs.Path(dataDir), true)
    f.rename(new org.apache.hadoop.fs.Path(s"$tmp/data"),
      new org.apache.hadoop.fs.Path(dataDir))
    assert(!spark.read.parquet(dataDir).columns.contains("zdict"))
    val blocks = ResumableEncodeJob.readBlocks(spark, dir)
    val back = TokenCompressor(EncodeOptions(numParts = 3)).decode(blocks)
      .collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    assert(back == input.collect().map(r => r.doc_id -> r.tokens.toSeq).toMap)
    // range reads share the explicit-schema path
    val some = RangeReader.readRange(spark, dir, "", "￿").collect()
    assert(some.length == 300)
  }

  test("concurrent snapshot commit loses cleanly (no silent clobber)") {
    import org.apache.spark.sql.Encoders
    val input = Fixtures.tokenTable(spark, 100L)
    val dir = java.nio.file.Files.createTempDirectory("graft_conflict").toString
    val snap = ResumableEncodeJob.run(input, dir, EncodeOptions(numParts = 2))
    // a racing committer writing the SAME version must fail closed
    val racing = snap.copy(committedAtMillis = snap.committedAtMillis + 1)
    intercept[SnapshotConflictException](ManifestIO.write(spark, dir, racing))
    // the committed snapshot is untouched
    assert(ManifestIO.latest(spark, dir).get.committedAtMillis == snap.committedAtMillis)
  }

  test("expireSnapshots reclaims old metadata; latest table state untouched") {
    val input = Fixtures.tokenTable(spark, 100L)
    val dir = java.nio.file.Files.createTempDirectory("graft_expire").toString
    val s1 = ResumableEncodeJob.run(input, dir, EncodeOptions(numParts = 2))
    // stack three more metadata versions on top (same data, new snapshots)
    var cur = s1
    (1 to 3).foreach { i =>
      cur = cur.copy(version = cur.version + 1,
        committedAtMillis = cur.committedAtMillis + i)
      ManifestIO.write(spark, dir, cur)
    }
    val before = TokenCompressor(EncodeOptions(numParts = 2))
      .decode(ResumableEncodeJob.readBlocks(spark, dir)).collect()
    assert(ManifestIO.at(spark, dir, s1.version).isDefined)
    // keep the newest 2: everything older goes (the encode run itself may
    // commit several part-batch snapshots), data files are untouched
    val nJsons = new java.io.File(dir, "snapshots").listFiles()
      .count(f => f.getName.startsWith("v") && f.getName.endsWith(".json"))
    assert(ManifestIO.expireSnapshots(spark, dir, keepLast = 2) == nJsons - 2)
    assert(ManifestIO.at(spark, dir, s1.version).isEmpty) // floor moved
    assert(ManifestIO.at(spark, dir, cur.version).isDefined)
    assert(ManifestIO.latest(spark, dir).get.version == cur.version)
    val after = TokenCompressor(EncodeOptions(numParts = 2))
      .decode(ResumableEncodeJob.readBlocks(spark, dir)).collect()
    assert(after.map(_.doc_id).sorted.sameElements(before.map(_.doc_id).sorted))
    // idempotent + keeps at least the latest
    assert(ManifestIO.expireSnapshots(spark, dir, keepLast = 2) == 0)
    intercept[IllegalArgumentException](
      ManifestIO.expireSnapshots(spark, dir, keepLast = 0))
  }
}
