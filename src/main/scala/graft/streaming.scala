package graft

import org.apache.spark.sql.{Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingestion into the encoded table: a file stream of
  * token rows is block-encoded per micro-batch and committed to the same
  * snapshot manifest the batch job uses.
  *
  * Exactly-once: Spark's streaming checkpoint gives at-least-once
  * foreachBatch invocations; idempotence comes from (a) recording the
  * highest committed batch id in each snapshot and skipping replays, and
  * (b) batch data landing in a batch-scoped subdirectory that is
  * deterministically overwritten on retry. The reference has no streaming
  * (SURVEY.md §2.8) — this is the Spark-native growth path for continuous
  * token ingestion.
  */
object StreamingEncode {

  val tokenSchema: org.apache.spark.sql.types.StructType =
    Encoders.product[TokenRow].schema

  /** Append one micro-batch of token rows as encoded blocks. Blocks are
    * routed with the table's persistent partition plan (from snapshot v0)
    * so stream and batch writes cluster identically.
    */
  def appendBatch(
      batch: Dataset[TokenRow],
      table: String,
      opts: EncodeOptions,
      batchId: Long
  ): Unit = {
    val spark = batch.sparkSession
    val base = ManifestIO.latest(spark, table).getOrElse {
      val plan = Planner.plan(batch, opts)
      val s0 = Snapshot(0, System.currentTimeMillis(), plan, Set.empty, Map.empty)
      ManifestIO.write(spark, table, s0)
      s0
    }
    if (base.streamBatchId.exists(_ >= batchId)) return // replayed batch
    val comp = TokenCompressor(opts)
    // one encode pass feeds BOTH the parquet write and the lineage metrics
    // (persist instead of re-reading the batch directory back: one fewer
    // job per micro-batch, and the metrics provably describe what was
    // encoded, not what a concurrent reader sees on disk)
    val blocks = comp.encodeWithPlan(batch, base.plan, None).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // batch-scoped directory: deterministic overwrite on retry
      val dir = s"$table/stream_batches/batch=$batchId"
      blocks.write.mode(SaveMode.Overwrite).parquet(dir)
      // ONE aggregation job serves both the lineage totals and the
      // per-codec counts (r9: the totals agg and the codec groupBy were
      // two separate jobs over the persisted blocks; grouped partials sum
      // and xor-fold driver-side to the identical totals). An empty
      // micro-batch (replay after checkpoint recovery) collects zero
      // groups and every total stays 0.
      val perCodec = blocks.groupBy("codec").agg(
        count(lit(1)).as("blocks"), sum("n_docs").as("docs"),
        sum("n_tokens").as("toks"), sum("raw_bytes").as("raw"),
        sum("encoded_bytes").as("enc"),
        expr("bit_xor(checksum)").as("ckx"),
        sum("enc_micros").as("micros")).collect()
      val newCodecs = perCodec.iterator
        .map(r => r.getAs[String]("codec") -> r.getAs[Long]("blocks")).toMap
      def ln(name: String): Long =
        if (name == "ckx") perCodec.foldLeft(0L)(_ ^ _.getAs[Long]("ckx"))
        else perCodec.iterator.map(_.getAs[Long](name)).sum
      // stream lineage carries the SAME fields as batch parts (round-2
      // verdict item 6): xor-of-checksums folds associatively across
      // batches, codec counts merge by sum, wall_micros accumulates the
      // per-block encode time like ManifestIO.lineageFor
      val lineage = base.lineage.updated(-1,
        base.lineage.get(-1).map { l =>
          l.copy(
            n_blocks = l.n_blocks + ln("blocks"),
            n_docs = l.n_docs + ln("docs"),
            n_tokens = l.n_tokens + ln("toks"),
            raw_bytes = l.raw_bytes + ln("raw"),
            encoded_bytes = l.encoded_bytes + ln("enc"),
            checksum_xor = l.checksum_xor ^ ln("ckx"),
            codecs = (l.codecs.keySet ++ newCodecs.keySet).map(k =>
              k -> (l.codecs.getOrElse(k, 0L) + newCodecs.getOrElse(k, 0L))).toMap,
            wall_micros = l.wall_micros + ln("micros"))
        }.getOrElse(PartLineage(-1, ln("blocks"), ln("docs"),
          ln("toks"), ln("raw"), ln("enc"),
          ln("ckx"), newCodecs, ln("micros"))))
      ManifestIO.write(spark, table,
        base.copy(version = base.version + 1,
          committedAtMillis = System.currentTimeMillis(),
          lineage = lineage,
          streamBatchId = Some(batchId)))
    } finally blocks.unpersist()
  }

  /** Start the ingestion stream over a directory of token parquet files. */
  def start(
      spark: SparkSession,
      inputDir: String,
      table: String,
      opts: EncodeOptions = EncodeOptions.default,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val stream = spark.readStream
      .schema(tokenSchema)
      .parquet(inputDir)
      .as[TokenRow](Encoders.product[TokenRow])
    stream.writeStream
      .foreachBatch { (batch: Dataset[TokenRow], batchId: Long) =>
        appendBatch(batch, table, opts, batchId)
      }
      .option("checkpointLocation", s"$table/_stream_checkpoint")
      .trigger(trigger)
      .start()
  }

  /** Read back everything the stream has COMMITTED, as encoded blocks:
    * the compacted runs (batches folded into the `compacted/run=V` part
    * layout) plus the still-uncompacted batch tail. Batch directories are
    * derived from the snapshot's streamBatchId — a bare glob would also
    * pick up a half-written directory from a crashed foreachBatch attempt
    * that never committed its snapshot, breaking the commit-then-visible
    * law the batch readers obey. Batches at or below compactedBatchId are
    * skipped even if their dirs still exist (a crash between compaction
    * commit and batch-dir cleanup leaves them; the next compaction sweeps).
    */
  def readCommittedBlocks(spark: SparkSession, table: String): Dataset[EncodedBlock] = {
    val snap = ManifestIO.latest(spark, table)
      .getOrElse(throw new IllegalStateException(s"no snapshot in $table"))
    val maxBatch = snap.streamBatchId.getOrElse(-1L)
    val minBatch = snap.compactedBatchId.map(_ + 1).getOrElse(0L)
    val runDirs = snap.compactedRuns
      .map(r => ManifestIO.compactedDir(table, r).toString)
    // one stream_batches listing, id-range filtered (a per-id exists()
    // probe over minBatch..maxBatch is unbounded for sparse batch ids)
    val batchDirs = ManifestIO.streamBatchDirs(spark, table, minBatch, maxBatch)
    // one scan per dir with an explicit basePath: a single multi-path scan
    // would run Hive-style partition inference across `run=V` / `batch=B`
    // parents and reject the mix as conflicting structures; per-dir reads
    // keep inference scoped to the part_id level. Column order is pinned
    // before the positional union (partitioned reads append part_id last)
    val cols = Encoders.product[EncodedBlock].schema.fieldNames.map(col)
    val base = spark.emptyDataset[EncodedBlock](Encoders.product[EncodedBlock]).toDF()
    val blocks = (runDirs ++ batchDirs)
      .map(d => spark.read
        .schema(Encoders.product[EncodedBlock].schema)
        .option("basePath", d)
        .parquet(d)
        .select(cols.toIndexedSeq: _*))
      .reduceOption(_ unionAll _)
      .getOrElse(base)
    blocks.select(cols.toIndexedSeq: _*)
      .as[EncodedBlock](Encoders.product[EncodedBlock])
  }

  /** Everything the stream has committed, decoded to token rows. */
  def readDecoded(spark: SparkSession, table: String): Dataset[TokenRow] =
    TokenCompressor(EncodeOptions.default).decode(readCommittedBlocks(spark, table))

  /** Fold the committed stream-batch tail into the table's part_id layout.
    *
    * A long-running ingest accumulates one directory of micro-batch-sized
    * blocks per trigger — at 10^12 sequences that is millions of small
    * files with no directory-level pruning and block sizes far below
    * [[EncodeOptions.blockTokens]] (worse codec ratios, per-block overhead
    * paid thousands of times over). Compaction decodes the batches at or
    * below the current streamBatchId and re-encodes them with the table's
    * PERSISTENT plan (same routing law as every batch write → identical
    * clustering, one exchange over just the compacted span, doc_id-sorted
    * full-size blocks with table reuse re-amortized), writes the result to
    * an immutable `compacted/run=V` directory, then commits a snapshot
    * whose `compactedBatchId` watermark makes the run visible and the
    * source batches invisible in the same atomic rename. Batch dirs are
    * deleted only after that commit; a crash anywhere leaves either an
    * unreferenced run dir (swept by the next compaction before it writes)
    * or already-invisible batch dirs (swept likewise) — never duplicate or
    * missing rows.
    *
    * Incremental by construction: each run compacts only (previous
    * watermark, streamBatchId], so steady-state cost tracks ingest rate,
    * not table size. Every run keeps the part_id dir layout, so
    * reader-side pruning is unaffected; the run COUNT is kept
    * logarithmic in table size by [[mergeRuns]]'s size-tiered policy.
    *
    * @return the committed snapshot, or the current one when there is
    *         nothing to compact
    */
  def compact(
      spark: SparkSession,
      table: String,
      opts: EncodeOptions = EncodeOptions.default
  ): Snapshot = {
    val base = ManifestIO.latest(spark, table)
      .getOrElse(throw new IllegalStateException(s"no snapshot in $table"))
    val maxBatch = base.streamBatchId.getOrElse(-1L)
    val minBatch = base.compactedBatchId.map(_ + 1).getOrElse(0L)
    val fs = ManifestIO.fs(spark, table)
    // sweep leftovers from crashed predecessors: run dirs no snapshot
    // references, and batch dirs already below the watermark
    val compactedRoot = new org.apache.hadoop.fs.Path(table, "compacted")
    if (fs.exists(compactedRoot)) {
      val live = base.compactedRuns.map(r => s"run=$r").toSet
      fs.listStatus(compactedRoot)
        .filterNot(st => live(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, true))
    }
    // swept-batch cleanup lists the stream_batches directory ONCE and
    // deletes entries below the watermark — a per-historical-id exists()
    // probe would grow O(total batches ever ingested) forever (at one
    // batch/minute, ~0.5M probes per compaction after a year)
    val batchesRoot = new org.apache.hadoop.fs.Path(table, "stream_batches")
    if (fs.exists(batchesRoot)) {
      fs.listStatus(batchesRoot).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch=") &&
          n.stripPrefix("batch=").toLongOption.exists(_ < minBatch))
          fs.delete(st.getPath, true)
      }
    }

    val pendingDirs = ManifestIO.streamBatchDirs(spark, table, minBatch, maxBatch)
    // nothing new to fold, but a crashed predecessor may have left the run
    // list un-merged — the tiering pass is idempotent and cheap when level
    if (pendingDirs.isEmpty) return mergeRuns(spark, table, base)

    val cols = Encoders.product[EncodedBlock].schema.fieldNames.map(col)
    val tail = spark.read
      .schema(Encoders.product[EncodedBlock].schema)
      .parquet(pendingDirs: _*)
      .select(cols.toIndexedSeq: _*)
      .as[EncodedBlock](Encoders.product[EncodedBlock])
    val run = base.version + 1
    // replay the table's recorded zdict probe decision, like every batch run
    val effOpts =
      if (base.zdictEnabled.contains(true))
        opts.copy(zdictBlocks = math.max(opts.zdictBlocks, 8))
      else opts
    TokenCompressor(effOpts)
      .encodeWithPlan(TokenCompressor(effOpts).decode(tail), base.plan, None)
      .toDF()
      .write.mode(SaveMode.Overwrite)
      .partitionBy("part_id")
      .parquet(ManifestIO.compactedDir(table, run).toString)

    val next = base.copy(
      version = run,
      committedAtMillis = System.currentTimeMillis(),
      compactedBatchId = Some(maxBatch),
      compactedRuns = base.compactedRuns :+ run,
      compactedRunBytes = runSizes(fs, table, base) :+
        dirBytes(fs, ManifestIO.compactedDir(table, run)))
    ManifestIO.write(spark, table, next)
    // post-commit cleanup; leftovers are invisible (watermark) and swept
    // by the next compaction if this delete dies mid-way
    pendingDirs.foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    mergeRuns(spark, table, next)
  }

  private def dirBytes(fs: org.apache.hadoop.fs.FileSystem,
                       p: org.apache.hadoop.fs.Path): Long =
    fs.getContentSummary(p).getLength

  /** Per-run on-disk sizes, from the snapshot when recorded (every commit
    * since the field existed) or from the filesystem for older tables.
    */
  private def runSizes(fs: org.apache.hadoop.fs.FileSystem, table: String,
                       snap: Snapshot): Seq[Long] =
    if (snap.compactedRunBytes.length == snap.compactedRuns.length)
      snap.compactedRunBytes
    else snap.compactedRuns.map(r => dirBytes(fs, ManifestIO.compactedDir(table, r)))

  /** Size-tiered run merging (LSM/Lucene-style): while the newest run has
    * grown to at least HALF its predecessor's size, the two are folded
    * into one — a pure block PASSTHROUGH (one shuffle of already-encoded
    * payload bytes, re-clustered by part_id and doc_id-sorted within each
    * part; no decode, no codec CPU). The invariant afterwards is
    * geometric run sizes (each run >2x the next newer), so the run count
    * — and with it every reader's union-branch count and file-listing
    * fan-out — stays O(log table/ingest) instead of growing one per
    * compaction forever, and each byte is rewritten O(log N) times total.
    * Each merge is its own atomic snapshot commit; a crash leaves either
    * an unreferenced target dir (swept) or committed-but-undeleted source
    * dirs (orphaned by the new run list, swept likewise).
    */
  private def mergeRuns(spark: SparkSession, table: String,
                        snap0: Snapshot): Snapshot = {
    val fs = ManifestIO.fs(spark, table)
    val cols = Encoders.product[EncodedBlock].schema.fieldNames.map(col)
    var snap = snap0
    var sizes = runSizes(fs, table, snap)
    while (snap.compactedRuns.length >= 2 &&
      sizes.last * 2 >= sizes(sizes.length - 2)) {
      val srcRuns = snap.compactedRuns.takeRight(2)
      val target = snap.version + 1
      srcRuns
        .map(r => spark.read
          .schema(Encoders.product[EncodedBlock].schema)
          .option("basePath", ManifestIO.compactedDir(table, r).toString)
          .parquet(ManifestIO.compactedDir(table, r).toString)
          .select(cols.toIndexedSeq: _*))
        .reduce(_ unionAll _)
        .repartition(col("part_id"))
        .sortWithinPartitions("part_id", "first_doc_id")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("part_id")
        .parquet(ManifestIO.compactedDir(table, target).toString)
      val merged = dirBytes(fs, ManifestIO.compactedDir(table, target))
      snap = snap.copy(
        version = target,
        committedAtMillis = System.currentTimeMillis(),
        compactedRuns = snap.compactedRuns.dropRight(2) :+ target,
        compactedRunBytes = sizes.dropRight(2) :+ merged)
      ManifestIO.write(spark, table, snap)
      srcRuns.foreach(r =>
        fs.delete(ManifestIO.compactedDir(table, r), true))
      sizes = snap.compactedRunBytes
    }
    snap
  }
}
