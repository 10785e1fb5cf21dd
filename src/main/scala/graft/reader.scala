package graft

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Selective reads over the encoded table: doc_id-range queries prune at
  * three levels before any payload is decoded —
  *  1. partition dirs (`part_id=K`) via the plan's range buckets,
  *  2. Parquet row groups via min/max stats on first/last_doc_id
  *     (PushedFilters), and
  *  3. per-row post-decode filter.
  * At 100 TB this turns a point/range lookup into a handful of block
  * reads instead of a table scan.
  */
object RangeReader {

  /** Part ids whose doc_id range can intersect [fromDoc, toDoc]. */
  def candidateParts(plan: PartitionPlan, fromDoc: String, toDoc: String): Seq[Int] = {
    val b0 = plan.bucketOf(fromDoc)
    val b1 = plan.bucketOf(toDoc)
    (b0 to b1).flatMap { b =>
      plan.partOffset(b) until (plan.partOffset(b) + plan.saltOf(b))
    }
  }

  /** Blocks possibly containing rows in [fromDoc, toDoc] (inclusive). */
  def rangeBlocks(
      spark: SparkSession,
      table: String,
      fromDoc: String,
      toDoc: String
  ): Dataset[EncodedBlock] = {
    val snap = ManifestIO.latest(spark, table)
      .getOrElse(throw new IllegalStateException(s"no snapshot in $table"))
    val cand = candidateParts(snap.plan, fromDoc, toDoc)
    val parts = cand.filter(snap.committed)
    // a stream-only table has no batch data/ dir at all — its blocks live
    // in compacted runs + the committed stream-batch tail, both unioned in
    val dataDir = ManifestIO.dataDir(table)
    val batch =
      if (ManifestIO.fs(spark, table).exists(dataDir))
        spark.read
          .schema(Encoders.product[EncodedBlock].schema)
          .parquet(dataDir.toString)
          .where(col("part_id").isin(parts: _*))
      else
        spark.emptyDataset[EncodedBlock](Encoders.product[EncodedBlock]).toDF()
    // compacted stream runs carry the same part_id dir layout and block
    // zone maps, so the identical three-level pruning applies — their
    // commit unit is the run dir (snapshot list), not the batch part set.
    // Column order is pinned per branch before the positional union
    // (partitioned reads append part_id last)
    val cols = Encoders.product[EncodedBlock].schema.fieldNames.map(col)
    val withRuns = snap.compactedRuns.foldLeft(batch.select(cols.toIndexedSeq: _*)) { (acc, run) =>
      acc.unionAll(spark.read
        .schema(Encoders.product[EncodedBlock].schema)
        .parquet(ManifestIO.compactedDir(table, run).toString)
        .where(col("part_id").isin(cand: _*))
        .select(cols.toIndexedSeq: _*))
    }
    // the committed stream-batch TAIL (batches past the compaction
    // watermark): without it a mid-ingest table silently returned
    // incomplete ranges that StreamingEncode.readDecoded does return.
    // Batch dirs are snapshot-bounded via ONE directory listing (the
    // (watermark, streamBatchId] filter keeps the commit-then-visible law
    // — a bare glob would pick up a crashed foreachBatch attempt; a
    // per-id exists() probe was unbounded for sparse ids) and
    // unpartitioned, so part_id pruning falls to parquet column zone
    // maps; the tail is bounded by ingest-since-last-compaction, not
    // table size.
    val tailDirs = ManifestIO.streamBatchDirs(spark, table,
      snap.compactedBatchId.map(_ + 1).getOrElse(0L),
      snap.streamBatchId.getOrElse(-1L))
    val all = tailDirs.foldLeft(withRuns) { (acc, dir) =>
      acc.unionAll(spark.read
        .schema(Encoders.product[EncodedBlock].schema)
        .parquet(dir)
        .where(col("part_id").isin(cand: _*))
        .select(cols.toIndexedSeq: _*))
    }
    all
      .where(col("last_doc_id") >= fromDoc && col("first_doc_id") <= toDoc)
      .select(cols.toIndexedSeq: _*)
      .as[EncodedBlock](Encoders.product[EncodedBlock])
  }

  /** Point lookup: the decoded row(s) for one doc_id — a degenerate range
    * read, so the same three-level pruning applies (one partition dir, the
    * few blocks whose [first,last] bracket the id, then the row filter).
    */
  def lookup(spark: SparkSession, table: String, docId: String): Dataset[TokenRow] =
    readRange(spark, table, docId, docId)

  /** Decoded rows with doc_id in [fromDoc, toDoc] (UTF-8 byte order,
    * matching the planner boundaries and Spark's own comparisons). The
    * fourth pruning level happens INSIDE each surviving block:
    * `decodeBlockRange` binary-searches the row span and, for fixed-stride
    * codecs, decodes only that span's tokens — point lookups cost
    * O(result), not O(blockTokens).
    */
  def readRange(
      spark: SparkSession,
      table: String,
      fromDoc: String,
      toDoc: String
  ): Dataset[TokenRow] = {
    val blocks = rangeBlocks(spark, table, fromDoc, toDoc)
    blocks.flatMap(b => BlockEncoder.decodeBlockRange(b, fromDoc, toDoc))(
      Encoders.product[TokenRow])
  }
}
