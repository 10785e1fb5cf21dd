package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Committing a snapshot version that already exists — the loser of a
  * concurrent commit race must reload and retry, never clobber.
  */
final class SnapshotConflictException(msg: String)
    extends java.io.IOException(msg)

/** Per-partition lineage + metrics recorded in every snapshot. */
final case class PartLineage(
    part_id: Int,
    n_blocks: Long,
    n_docs: Long,
    n_tokens: Long,
    raw_bytes: Long,
    encoded_bytes: Long,
    checksum_xor: Long,
    codecs: Map[String, Long],
    wall_micros: Long
)

/** One committed snapshot of the encoded table. `streamBatchId` is the
  * highest streaming micro-batch folded in (None for pure-batch tables);
  * replayed foreachBatch invocations with id <= this are skipped.
  * `ivfCentroids` persists a trained IVF coarse quantizer (k x dim unit
  * vectors) so the ANN index is resumable/time-travelable like the table
  * itself and queries skip retraining (see [[IvfIndex]]).
  */
final case class Snapshot(
    version: Int,
    committedAtMillis: Long,
    plan: PartitionPlan,
    committed: Set[Int],
    lineage: Map[Int, PartLineage],
    streamBatchId: Option[Long] = None,
    ivfCentroids: Option[Array[Array[Double]]] = None,
    zdictEnabled: Option[Boolean] = None, // ZdictProbe decision at v0 (None = not probed)
    // stream-batch compaction state: batches <= compactedBatchId have been
    // re-encoded into compacted/run=V dirs (one entry per compaction run)
    // and their batch dirs deleted; readers union the runs with the
    // still-uncompacted batch tail. compactedRunBytes records each run
    // dir's on-disk size (parallel to compactedRuns) so the size-tiered
    // merge policy never has to walk the filesystem
    compactedBatchId: Option[Long] = None,
    compactedRuns: Seq[Int] = Nil,
    compactedRunBytes: Seq[Long] = Nil
)

/** Iceberg-style append-only snapshot log over partitioned Parquet.
  *
  * No Iceberg runtime jar ships in this sandbox (see SURVEY.md §7.0), so the
  * table format is emulated with the same commit semantics Iceberg uses: an
  * immutable versioned metadata file per snapshot, made visible by a single
  * atomic rename — readers either see the whole snapshot or none of it.
  * Layout: `data/part_id=K/` parquet files + `snapshots/vNNNNN.json`.
  *
  * Uses the Hadoop FileSystem API so the same code runs on HDFS/object
  * stores on a real cluster, not just local files.
  */
object ManifestIO {
  private def mapper = new ObjectMapper()

  def snapshotsDir(table: String) = new Path(table, "snapshots")
  def dataDir(table: String) = new Path(table, "data")
  def compactedDir(table: String, run: Int) =
    new Path(table, s"compacted/run=$run")

  def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Stream-batch dirs with batch id in [minBatch, maxBatch], from ONE
    * `stream_batches/` listing. `appendBatch` accepts arbitrary —
    * possibly sparse or time-derived — batch ids, so the per-id
    * `fs.exists` probe over the full id range this replaces was unbounded
    * in the id GAP, not the batch count (ADVICE r6). Sorted by id for a
    * deterministic union order downstream.
    */
  def streamBatchDirs(spark: SparkSession, table: String,
                      minBatch: Long, maxBatch: Long): Seq[String] = {
    if (minBatch > maxBatch) return Seq.empty
    val f = fs(spark, table)
    val root = new Path(table, "stream_batches")
    if (!f.exists(root)) return Seq.empty
    f.listStatus(root).toSeq
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch="))
          n.stripPrefix("batch=").toLongOption
            .filter(b => b >= minBatch && b <= maxBatch)
            .map(b => (b, st.getPath.toString))
        else None
      }
      .sortBy(_._1).map(_._2)
  }

  def latest(spark: SparkSession, table: String): Option[Snapshot] = {
    val f = fs(spark, table)
    val dir = snapshotsDir(table)
    if (!f.exists(dir)) return None
    val versions = f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
    if (versions.isEmpty) None
    else {
      val v = versions.max
      val in = f.open(new Path(dir, f"v$v%05d.json"))
      val bytes =
        try org.apache.commons.io.IOUtils.toByteArray(in)
        finally in.close()
      Some(fromJson(mapper.readTree(bytes)))
    }
  }

  /** Expire old snapshot metadata, Iceberg's expire-snapshots analog for
    * this table's growth axis: the DATA dirs are already bounded (parts
    * rewrite in place with stale-file cleanup; compaction deletes folded
    * batch dirs and merged runs), but `snapshots/` gains one JSON per
    * commit forever — at one streaming commit a minute that is ~0.5M
    * files/year of metadata and an O(versions) listing in [[latest]].
    * Deletes every snapshot JSON older than the newest `keepLast`
    * (metadata only — no data file is touched, since live snapshots
    * reference the same dirs); time travel floor moves accordingly
    * (`at(expired)` returns None). Returns the number of files deleted.
    */
  def expireSnapshots(spark: SparkSession, table: String, keepLast: Int = 1): Int = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val f = fs(spark, table)
    val dir = snapshotsDir(table)
    if (!f.exists(dir)) return 0
    val versioned = f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
      .sorted
    val expired = versioned.dropRight(keepLast)
    expired.foreach(v => f.delete(new Path(dir, f"v$v%05d.json"), false))
    expired.length
  }

  /** Time travel: load a specific committed snapshot version. */
  def at(spark: SparkSession, table: String, version: Int): Option[Snapshot] = {
    val f = fs(spark, table)
    val p = new Path(snapshotsDir(table), f"v$version%05d.json")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val bytes =
        try org.apache.commons.io.IOUtils.toByteArray(in)
        finally in.close()
      Some(fromJson(mapper.readTree(bytes)))
    }
  }

  def write(spark: SparkSession, table: String, s: Snapshot): Unit = {
    val f = fs(spark, table)
    val dir = snapshotsDir(table)
    f.mkdirs(dir)
    val tmp = new Path(dir, f".v${s.version}%05d.json.tmp")
    val dst = new Path(dir, f"v${s.version}%05d.json")
    // optimistic concurrency: a snapshot version is immutable once
    // committed. On HDFS/object stores rename-to-existing fails atomically;
    // the local filesystem's rename OVERWRITES, so a losing concurrent
    // committer would silently clobber — fail closed on an existing
    // version instead (Iceberg's commit-conflict semantics).
    if (f.exists(dst))
      throw new SnapshotConflictException(
        s"snapshot v${s.version} already committed in $table — " +
          "reload the latest snapshot and retry the commit")
    val out = f.create(tmp, true)
    try out.write(toJson(s).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"snapshot commit failed: $tmp -> $dst")
  }

  def toJson(s: Snapshot): String = {
    val m = mapper
    val root = m.createObjectNode()
    root.put("version", s.version)
    root.put("committed_at", s.committedAtMillis)
    s.streamBatchId.foreach(b => root.put("stream_batch_id", b))
    s.zdictEnabled.foreach(z => root.put("zdict_enabled", z))
    s.compactedBatchId.foreach(b => root.put("compacted_batch_id", b))
    if (s.compactedRuns.nonEmpty) {
      val ca = root.putArray("compacted_runs"); s.compactedRuns.foreach(ca.add)
      val cb = root.putArray("compacted_run_bytes")
      s.compactedRunBytes.foreach(cb.add)
    }
    val p = root.putObject("plan")
    val ba = p.putArray("boundaries"); s.plan.boundaries.foreach(ba.add)
    val sa = p.putArray("saltOf"); s.plan.saltOf.foreach(sa.add)
    val oa = p.putArray("partOffset"); s.plan.partOffset.foreach(oa.add)
    p.put("numParts", s.plan.numParts)
    val ca = root.putArray("committed"); s.committed.toSeq.sorted.foreach(ca.add)
    s.ivfCentroids.foreach { cents =>
      val ia = root.putArray("ivf_centroids")
      cents.foreach { c => val row = ia.addArray(); c.foreach(row.add) }
    }
    val ln = root.putObject("lineage")
    s.lineage.toSeq.sortBy(_._1).foreach { case (k, l) =>
      val o = ln.putObject(k.toString)
      o.put("part_id", l.part_id)
      o.put("n_blocks", l.n_blocks)
      o.put("n_docs", l.n_docs)
      o.put("n_tokens", l.n_tokens)
      o.put("raw_bytes", l.raw_bytes)
      o.put("encoded_bytes", l.encoded_bytes)
      o.put("checksum_xor", l.checksum_xor)
      o.put("wall_micros", l.wall_micros)
      val c = o.putObject("codecs")
      l.codecs.toSeq.sortBy(_._1).foreach { case (n, v) => c.put(n, v) }
    }
    root.toPrettyString
  }

  def fromJson(root: JsonNode): Snapshot = {
    def intArray(n: JsonNode): Array[Int] =
      n.elements().asScala.map(_.asInt).toArray
    val p = root.get("plan")
    val plan = PartitionPlan(
      p.get("boundaries").elements().asScala.map(_.asText).toArray,
      intArray(p.get("saltOf")),
      intArray(p.get("partOffset")),
      p.get("numParts").asInt
    )
    val lineage = root.get("lineage").fields().asScala.map { e =>
      val o = e.getValue
      val codecs = o.get("codecs").fields().asScala
        .map(c => c.getKey -> c.getValue.asLong).toMap
      e.getKey.toInt -> PartLineage(
        o.get("part_id").asInt,
        o.get("n_blocks").asLong,
        o.get("n_docs").asLong,
        o.get("n_tokens").asLong,
        o.get("raw_bytes").asLong,
        o.get("encoded_bytes").asLong,
        o.get("checksum_xor").asLong,
        codecs,
        o.get("wall_micros").asLong
      )
    }.toMap
    Snapshot(
      root.get("version").asInt,
      root.get("committed_at").asLong,
      plan,
      root.get("committed").elements().asScala.map(_.asInt).toSet,
      lineage,
      Option(root.get("stream_batch_id")).map(_.asLong),
      Option(root.get("ivf_centroids")).map(_.elements().asScala
        .map(row => row.elements().asScala.map(_.asDouble).toArray).toArray),
      Option(root.get("zdict_enabled")).map(_.asBoolean),
      Option(root.get("compacted_batch_id")).map(_.asLong),
      Option(root.get("compacted_runs")).toSeq
        .flatMap(_.elements().asScala.map(_.asInt)),
      Option(root.get("compacted_run_bytes")).toSeq
        .flatMap(_.elements().asScala.map(_.asLong))
    )
  }
}

/** Resumable encode job: encodes only partitions not yet committed to the
  * latest snapshot, in bounded batches, committing a new snapshot per batch.
  * An interrupted `spark-submit` rerun therefore continues from the last
  * committed snapshot (north_rule), re-encoding at most one in-flight batch
  * whose stale files are cleaned deterministically before re-write.
  */
object ResumableEncodeJob {

  /** @param maxPartsPerRun bound on partitions encoded by this invocation
    *                       (tests use it to simulate interruption)
    * @return the latest snapshot after this run
    */
  def run(
      input: Dataset[TokenRow],
      table: String,
      opts: EncodeOptions = EncodeOptions.default,
      maxPartsPerRun: Int = Int.MaxValue
  ): Snapshot = {
    val spark = input.sparkSession

    val base = ManifestIO.latest(spark, table).getOrElse {
      val plan = Planner.plan(input, opts)
      // zdict auto-probe runs ONCE, at table creation: CollectLimit pulls
      // the sample from O(1) input partitions (not a corpus scan), and the
      // decision is persisted in snapshot v0 — replay consistency for every
      // resume/batch comes from the manifest, not from the sample itself
      val zd: Option[Boolean] =
        if (opts.zdictAuto && opts.zdictBlocks == 0 && opts.zstdLevel > 0
            && Zframe.available)
          Some(ZdictProbe.decide(
            input.limit(ZdictProbe.SampleDocs).collect(), opts)._1)
        else None
      val s0 = Snapshot(0, System.currentTimeMillis(), plan, Set.empty,
        Map.empty, zdictEnabled = zd)
      ManifestIO.write(spark, table, s0)
      s0
    }
    // the recorded probe decision (this run's or an earlier run's) wins
    val effOpts =
      if (base.zdictEnabled.contains(true))
        opts.copy(zdictBlocks = math.max(opts.zdictBlocks, 8))
      else opts
    val compressor = TokenCompressor(effOpts)
    val plan = base.plan
    val pending = (0 until plan.numParts).filterNot(base.committed)
    if (pending.isEmpty) return base
    val batch = pending.take(maxPartsPerRun).toSet

    // deterministic cleanup of any uncommitted leftovers for this batch
    val f = ManifestIO.fs(spark, table)
    batch.foreach { pid =>
      val d = new Path(ManifestIO.dataDir(table), s"part_id=$pid")
      if (f.exists(d)) f.delete(d, true)
    }

    // one encode pass feeds BOTH the parquet write and the lineage
    // aggregation (r9 — same law appendBatch already applied): the former
    // read-back of the just-written files cost an extra listing + scan per
    // run, and the persisted blocks provably describe what was encoded
    val blocks = compressor.encodeWithPlan(input, plan, Some(batch)).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lineage =
      try {
        blocks.write
          .mode(SaveMode.Append)
          .partitionBy("part_id")
          .parquet(ManifestIO.dataDir(table).toString)
        lineageOf(blocks)
      } finally { blocks.unpersist(); () }

    // parts in the batch with zero rows still count as committed
    val next = Snapshot(
      base.version + 1,
      System.currentTimeMillis(),
      plan,
      base.committed ++ batch,
      base.lineage ++ lineage,
      zdictEnabled = base.zdictEnabled
    )
    ManifestIO.write(spark, table, next)
    next
  }

  /** Lineage from the committed files themselves, in ONE job: a two-level
    * aggregation ((part_id, codec) partials, then per-part rollup with the
    * codec map + xor-of-checksums via the bit_xor aggregate — no
    * collect_list of checksums ever materializes) and a single collect of
    * one small row per part. The read is column-pruned (payload never
    * touched) and schema-explicit so a zero-block batch (only _SUCCESS on
    * disk) yields empty lineage instead of a schema-inference failure.
    */
  private def lineageFor(spark: SparkSession, table: String,
                         batch: Set[Int]): Map[Int, PartLineage] = {
    import org.apache.spark.sql.Encoders
    val written = spark.read
      .schema(Encoders.product[EncodedBlock].schema)
      .parquet(ManifestIO.dataDir(table).toString)
      .where(col("part_id").isin(batch.toSeq: _*))
    lineageOf(written)
  }

  /** The lineage aggregation alone, over any block DataFrame (the written
    * files or the persisted encode output — identical rows either way).
    */
  private def lineageOf(written: org.apache.spark.sql.DataFrame): Map[Int, PartLineage] = {
    written
      .groupBy("part_id", "codec")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum("n_docs").as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("raw_bytes").as("raw_bytes"),
        sum("encoded_bytes").as("encoded_bytes"),
        sum("enc_micros").as("wall_micros"),
        expr("bit_xor(checksum)").as("ckx"))
      .groupBy("part_id")
      .agg(
        sum("n_blocks").as("n_blocks"),
        sum("n_docs").as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("raw_bytes").as("raw_bytes"),
        sum("encoded_bytes").as("encoded_bytes"),
        sum("wall_micros").as("wall_micros"),
        expr("bit_xor(ckx)").as("checksum_xor"),
        map_from_entries(collect_list(struct(col("codec"), col("n_blocks"))))
          .as("codecs"))
      .collect().map { r =>
        r.getAs[Int]("part_id") -> PartLineage(
          r.getAs[Int]("part_id"),
          r.getAs[Long]("n_blocks"),
          r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"),
          r.getAs[Long]("raw_bytes"),
          r.getAs[Long]("encoded_bytes"),
          r.getAs[Long]("checksum_xor"),
          r.getAs[Map[String, Long]]("codecs"),
          r.getAs[Long]("wall_micros")
        )
      }.toMap
  }

  /** Resumable table-level codec-policy migration: re-encode SRC's
    * committed parts into DST under `opts`, part-batched with the same
    * commit/cleanup discipline as [[run]]. The per-part work is the NARROW
    * [[TokenCompressor.recompress]] path — raw tokens never shuffle, DST
    * inherits SRC's partition plan, and an interrupted migration resumes
    * from its last committed snapshot exactly like an interrupted encode.
    */
  def migrate(
      spark: SparkSession,
      srcTable: String,
      dstTable: String,
      opts: EncodeOptions = EncodeOptions.default,
      maxPartsPerRun: Int = Int.MaxValue
  ): Snapshot = {
    val srcSnap = ManifestIO.latest(spark, srcTable)
      .getOrElse(throw new IllegalStateException(s"no snapshot in $srcTable"))
    val base = ManifestIO.latest(spark, dstTable).getOrElse {
      // the zdict probe decision is a property of the DATA, so a policy
      // migration inherits it from SRC rather than re-probing
      val s0 = Snapshot(0, System.currentTimeMillis(), srcSnap.plan, Set.empty,
        Map.empty, zdictEnabled = srcSnap.zdictEnabled)
      ManifestIO.write(spark, dstTable, s0)
      s0
    }
    val pending = srcSnap.committed.toSeq.sorted.filterNot(base.committed)
    if (pending.isEmpty) return base
    val batch = pending.take(maxPartsPerRun).toSet

    val f = ManifestIO.fs(spark, dstTable)
    batch.foreach { pid =>
      val d = new Path(ManifestIO.dataDir(dstTable), s"part_id=$pid")
      if (f.exists(d)) f.delete(d, true)
    }

    val srcBlocks = readBlocks(spark, srcTable)
      .where(col("part_id").isin(batch.toSeq: _*))
      .as[EncodedBlock](org.apache.spark.sql.Encoders.product[EncodedBlock])
    // one recompress pass feeds the write AND the lineage agg (see run())
    val out = TokenCompressor(opts).recompress(srcBlocks).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lineage =
      try {
        out.write.mode(SaveMode.Append)
          .partitionBy("part_id")
          .parquet(ManifestIO.dataDir(dstTable).toString)
        lineageOf(out)
      } finally { out.unpersist(); () }

    val next = Snapshot(
      base.version + 1,
      System.currentTimeMillis(),
      srcSnap.plan,
      base.committed ++ batch,
      base.lineage ++ lineage,
      zdictEnabled = base.zdictEnabled
    )
    ManifestIO.write(spark, dstTable, next)
    next
  }

  /** Read the encoded table back as blocks. `asOfVersion` time-travels to
    * an older snapshot (Iceberg semantics: a snapshot's part set is
    * immutable once committed, so old reads stay consistent while new
    * parts land).
    */
  def readBlocks(spark: SparkSession, table: String,
                 asOfVersion: Option[Int] = None): Dataset[EncodedBlock] = {
    import org.apache.spark.sql.Encoders
    val snap = asOfVersion
      .map(v => ManifestIO.at(spark, table, v)
        .getOrElse(throw new IllegalStateException(s"no snapshot v$v in $table")))
      .orElse(ManifestIO.latest(spark, table))
      .getOrElse(throw new IllegalStateException(s"no snapshot in $table"))
    val committed = snap.committed.toSeq
    // schema-explicit: a committed-but-empty table (zero input rows) has no
    // parquet footers to infer from and must read back as empty, not throw;
    // a stream-only table (compacted runs, no batch write) has no data/ dir
    val dataDir = ManifestIO.dataDir(table)
    val batch =
      if (ManifestIO.fs(spark, table).exists(dataDir))
        spark.read
          .schema(Encoders.product[EncodedBlock].schema)
          .parquet(dataDir.toString)
          .where(col("part_id").isin(committed: _*))
      else
        spark.emptyDataset[EncodedBlock](Encoders.product[EncodedBlock]).toDF()
    // stream-compaction runs are committed as whole directories (the run id
    // rides in the snapshot), independent of the batch parts' committed set.
    // partitionBy pushed part_id to the directory key; column order is
    // pinned per branch before the positional union
    val cols = Encoders.product[EncodedBlock].schema.fieldNames.map(col)
    val df = snap.compactedRuns.foldLeft(batch.select(cols.toSeq: _*)) { (acc, run) =>
      acc.unionAll(spark.read
        .schema(Encoders.product[EncodedBlock].schema)
        .parquet(ManifestIO.compactedDir(table, run).toString)
        .select(cols.toSeq: _*))
    }
    df.as[EncodedBlock](Encoders.product[EncodedBlock])
  }
}
