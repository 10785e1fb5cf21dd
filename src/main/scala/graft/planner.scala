package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Deterministic range-partition plan over doc_id with per-bucket salting
  * for skew.
  *
  * Spark's own `repartitionByRange` samples nondeterministically, which
  * would break resume (part ids must be stable across runs — the analog of
  * the reference's determinism discipline, where the only nondeterminism is
  * confined to id minting, /root/reference/src/EncodeTools.ts:529-541). We
  * instead compute explicit boundary strings once from a deterministic
  * hash-selected sample weighted by n_tok, persist them in the snapshot
  * manifest, and route rows by binary search.
  *
  * Bucket b covers doc_ids in (boundaries(b-1), boundaries(b)]; bucket 0 is
  * (-inf, boundaries(0)], the last bucket (boundaries(B-2), +inf). A bucket
  * whose sampled token weight exceeds 2x the target is salted: split into k
  * sub-parts by xxhash64(doc_id) — this handles ranges that quantiles cannot
  * split (duplicate or highly-concentrated keys).
  */
/** doc_id ordering used EVERYWHERE boundaries are compared: UTF-8 byte
  * order, identical to Spark's UTF8String binary comparison (orderBy,
  * column `<`/`>=`) — Java's String.compareTo orders by UTF-16 code unit,
  * which diverges for supplementary-plane characters, so a mixed ordering
  * could silently drop rows from a range read.
  */
object DocIdOrder extends Ordering[String] {
  def compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
}

final case class PartitionPlan(
    boundaries: Array[String],
    saltOf: Array[Int],
    partOffset: Array[Int],
    numParts: Int
) extends Serializable {

  def numBuckets: Int = saltOf.length

  /** The ONE implementation of the routing law lives in [[PlanRouting]]
    * (the executor-side kernel behind the PartIdOf codegen expression);
    * these driver-side conveniences delegate through a UTF8String
    * conversion — rare calls (range-read brackets, tests), so the copy is
    * irrelevant, and the law cannot fork between driver and executors.
    */
  @transient private lazy val routing = new PlanRouting(this)

  def bucketOf(docId: String): Int =
    routing.bucketOfU(org.apache.spark.unsafe.types.UTF8String.fromString(docId))

  def partIdOf(docId: String): Int =
    routing.partId(org.apache.spark.unsafe.types.UTF8String.fromString(docId))
}

/** Executor-side routing kernel behind the PartIdOf codegen expression AND
  * the single home of the routing law: boundary strings pre-decoded to
  * [[org.apache.spark.unsafe.types.UTF8String]] so the per-row binary
  * search compares Tungsten bytes in place (`binaryCompare` = unsigned
  * byte order = [[DocIdOrder]] — the one ordering every boundary
  * comparison in the engine uses). The salted-bucket branch (rare by
  * construction: only ranges the planner could not split) pays one
  * byte-copy for the xxh64; the common branch allocates nothing.
  */
final class PlanRouting(plan: PartitionPlan) extends Serializable {
  private val bounds: Array[org.apache.spark.unsafe.types.UTF8String] =
    plan.boundaries.map(org.apache.spark.unsafe.types.UTF8String.fromString)
  private val saltOf: Array[Int] = plan.saltOf
  private val partOffset: Array[Int] = plan.partOffset
  val numParts: Int = plan.numParts

  /** First index with boundaries(i) >= id (unsigned byte order); bucket
    * index range [0, boundaries.length].
    */
  def bucketOfU(id: org.apache.spark.unsafe.types.UTF8String): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid).binaryCompare(id) < 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  def partId(id: org.apache.spark.unsafe.types.UTF8String): Int = {
    // doc_id is the routing key and non-null by contract: fail HERE, with a
    // diagnosable message, instead of letting a null part_id flow through
    // the exchange and die later in the routed rows' .as[] decode
    if (id == null)
      throw new NullPointerException(
        "doc_id is the encode routing key and must be non-null " +
          "(filter or repair null doc_id rows before TokenCompressor.encode)")
    val b = bucketOfU(id)
    val k = saltOf(b)
    if (k <= 1) partOffset(b)
    else {
      val h = Checksum.xxh64(id.getBytes)
      partOffset(b) + (((h % k) + k) % k).toInt
    }
  }

  /** Equality on the underlying plan content (boundaries/saltOf/partOffset/
    * numParts), not object identity: [[PartIdOf]] is a case class whose
    * routing field participates in expression equality, so two routing
    * expressions built from the same plan must compare equal for Catalyst
    * subexpression elimination / exchange reuse to apply when the encode
    * pipeline is composed more than once in one query.
    */
  override def equals(o: Any): Boolean = o match {
    case r: PlanRouting =>
      numParts == r.numParts &&
        java.util.Arrays.equals(saltOf, r.saltOf) &&
        java.util.Arrays.equals(partOffset, r.partOffset) &&
        bounds.length == r.bounds.length &&
        bounds.indices.forall(i => bounds(i) == r.bounds(i))
    case _ => false
  }
  override def hashCode: Int = {
    var h = numParts
    h = h * 31 + java.util.Arrays.hashCode(saltOf)
    h = h * 31 + java.util.Arrays.hashCode(partOffset)
    bounds.foreach(b => h = h * 31 + b.hashCode)
    h
  }
}

object Planner {

  /** Hard ceiling on keys collected to the driver for boundary planning.
    * At 10^12 rows the auto-derived sampleMod keeps the collected sample at
    * or below this; boundaries remain statistically near-exact because
    * weights are token counts, not row counts.
    */
  val MaxSampleKeys: Long = 1L << 20

  /** Auto-sampling targets ~1 Ki sampled keys per requested partition
    * (clamped to [2^16, MaxSampleKeys]) instead of always filling the
    * MaxSampleKeys ceiling: boundary placement error scales with
    * 1/(samples per part), so 1 Ki/part is already far below the 2x salt
    * threshold, while collecting and sorting a full-ceiling sample cost
    * ~2 s of driver time on EVERY plan() call (measured round 9 — half
    * the wall time of each oracle encode query came from planning).
    */
  def targetSampleKeys(numParts: Int): Long =
    math.min(MaxSampleKeys, math.max(1L << 16, numParts.toLong << 10))

  /** Deterministic sampleMod so the collected sample stays near the target:
    * purely a function of the input row count (and the requested part
    * count), so re-runs (resume) derive the identical plan.
    */
  def autoSampleMod(rowCount: Long): Int = autoSampleMod(rowCount, MaxSampleKeys)

  def autoSampleMod(rowCount: Long, targetKeys: Long): Int =
    math.max(1L, (rowCount + targetKeys - 1) / targetKeys).toInt

  /** Build a plan from a deterministic hash-selected sample of
    * (doc_id, n_tok). sampleMod<=0 (the default) self-tunes from a count()
    * so the driver never collects an unbounded key set; an explicit
    * sampleMod=1 forces the exact all-rows plan (tests/small tables only).
    * The sample is sorted driver-side in UTF-8 byte order ([[DocIdOrder]]),
    * matching Spark's own string comparisons — no cluster-wide sort needed.
    *
    * Cost note: the auto count() is metadata-only on Parquet sources but a
    * full pass on computed inputs. Production jobs plan ONCE per table
    * (ResumableEncodeJob persists the plan in snapshot v0, and every
    * resume/stream batch reuses it); callers re-encoding computed inputs
    * repeatedly should set sampleMod explicitly to skip the count.
    */
  def plan(ds: Dataset[TokenRow], opts: EncodeOptions): PartitionPlan = {
    val mod =
      if (opts.sampleMod > 0) opts.sampleMod
      else autoSampleMod(ds.count(), targetSampleKeys(opts.numParts))
    val sampled =
      if (mod <= 1) ds.select(col("doc_id"), col("n_tok"))
      else
        ds.select(col("doc_id"), col("n_tok"))
          .where(pmod(xxhash64(col("doc_id")), lit(mod)) === 0)
    val collected = sampled
      .collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
    fromSample(sortByDocId(collected), opts.numParts)
  }

  /** [[DocIdOrder]] sort of the collected sample with the UTF-8 encoding
    * hoisted out of the comparator: `sortBy(_._1)(DocIdOrder)` re-encoded
    * both strings on every one of the O(n log n) comparisons (~1.2 s of
    * single-threaded driver time at a 600 K-key sample); one encode per
    * key plus `Arrays.compareUnsigned` is the identical ordering at a
    * fraction of the cost.
    */
  private[graft] def sortByDocId(rows: Array[(String, Long)]): Array[(String, Long)] = {
    val keyed = rows.map { t =>
      (t._1.getBytes(java.nio.charset.StandardCharsets.UTF_8), t)
    }
    java.util.Arrays.sort(keyed,
      (a: (Array[Byte], (String, Long)), b: (Array[Byte], (String, Long))) =>
        java.util.Arrays.compareUnsigned(a._1, b._1))
    keyed.map(_._2)
  }

  /** Pure, deterministic plan construction from a doc_id-sorted weighted
    * sample. Exposed for tests.
    */
  def fromSample(sorted: Array[(String, Long)], targetParts: Int): PartitionPlan = {
    if (sorted.isEmpty)
      return PartitionPlan(Array.empty, Array(1), Array(0), 1)
    val total = math.max(sorted.map(_._2 + 1).sum, 1L) // +1: weight empty docs
    val perPart = math.max(total / math.max(targetParts, 1), 1L)

    // walk the sorted sample accumulating weight; cut a boundary when the
    // running bucket reaches perPart, never splitting a doc_id
    val bounds = scala.collection.mutable.ArrayBuffer.empty[String]
    val weights = scala.collection.mutable.ArrayBuffer.empty[Long]
    var acc = 0L
    var i = 0
    while (i < sorted.length) {
      val (id, w) = sorted(i)
      acc += w + 1
      val isLast = i == sorted.length - 1
      val nextDiffers = isLast || sorted(i + 1)._1 != id
      if (acc >= perPart && nextDiffers && !isLast && bounds.length < targetParts - 1) {
        bounds += id
        weights += acc
        acc = 0L
      }
      i += 1
    }
    weights += acc // last bucket

    // salt buckets that remain oversized (range-unsplittable concentration)
    val saltOf = weights.map { w =>
      if (w > 2 * perPart) math.min((w + perPart - 1) / perPart, 64L).toInt
      else 1
    }.toArray
    val partOffset = new Array[Int](saltOf.length)
    var off = 0
    var b = 0
    while (b < saltOf.length) {
      partOffset(b) = off
      off += saltOf(b)
      b += 1
    }
    PartitionPlan(bounds.toArray, saltOf, partOffset, off)
  }
}
