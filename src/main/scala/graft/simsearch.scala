package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against the full table, dot products in codegen'd built-in expressions
  * (`zip_with` + `aggregate`), ranked per query with a window. No O(n²)
  * shuffle: the corpus is scanned once.
  *
  * Scale path: LSH with seeded random hyperplanes — one narrow pass computes
  * a b-bit signature per vector, candidates share a bucket (plus multi-probe
  * on 1-bit flips), exact cosine re-ranks inside buckets. At 100 TB the
  * bucket join replaces the full scan; signatures are deterministic
  * (splitmix-seeded hyperplanes), so re-runs and resumes agree.
  */
object SimSearch {

  /** Cosine similarity between two float-array columns, computed in double
    * precision left-to-right (matches DuckDB's list_cosine_similarity
    * accumulation for oracle comparison).
    */
  def cosineCol(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Brute-force cosine top-k: for each query vector (small set, broadcast),
    * rank the corpus by similarity. Deterministic tie-break on vec_id.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5
  ): DataFrame = {
    val crossed = corpus.as("c").crossJoin(broadcast(queries.as("q")))
      .where(col("c.vec_id") =!= col("q.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        cosineCol(col("q.embedding"), col("c.embedding")).as("cos")
      )
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    crossed.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic random hyperplanes: bits x dim matrix from splitmix. */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new Fixtures.Rng(seed)
    Array.fill(bits)(Array.fill(dim)(rng.gaussian()))
  }

  def signature(vec: Array[Float], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      var s = 0.0
      val p = planes(b)
      var i = 0
      val n = math.min(vec.length, p.length)
      while (i < n) { s += vec(i) * p(i); i += 1 }
      if (s > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private def lshBanded(corpus: DataFrame, bits: Int, probes: Int,
                        dim: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val planes = spark.sparkContext.broadcast(hyperplanes(bits, dim))
    corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val pl = planes.value
        it.flatMap { case (id, v) =>
          val s = signature(v, pl)
          val base = (0, id, s, v)
          val flips = (0 until probes).map(b => (b + 1, id, s ^ (1L << b), v))
          (Seq(base) ++ flips).map { case (probe, i, sg, vv) => (i, sg, vv) }
        }
      }
      .toDF("vec_id", "bucket", "embedding")
  }

  /** Dropped-mass accounting for the LSH maxBucket cap (same contract as
    * TextOps.minhashBucketStats).
    */
  def lshBucketStats(corpus: DataFrame, bits: Int = 16, probes: Int = 0,
                     dim: Int = 64, maxBucket: Int = 256): DataFrame = {
    val sizes = lshBanded(corpus, bits, probes, dim)
      .groupBy("bucket").agg(count(lit(1)).as("bsz"))
    sizes.agg(
      count(lit(1)).as("n_buckets"),
      sum(when(col("bsz").between(2, maxBucket), 1L).otherwise(0L)).as("n_pair_buckets"),
      sum(when(col("bsz") > maxBucket, 1L).otherwise(0L)).as("n_oversized"),
      sum(when(col("bsz") > maxBucket,
        (col("bsz") * (col("bsz") - 1) / 2).cast("long"))
        .otherwise(0L)).as("dropped_candidate_pairs"))
  }

  /** LSH-bucketed near-neighbor pairs: vectors sharing a signature bucket
    * are candidates; exact cosine verifies. `probes` adds 1-bit-flip
    * buckets (multi-probe) to raise recall without more tables. Oversized
    * buckets (> maxBucket members) are excluded by a pre-count BEFORE any
    * member list materializes (bounded executor memory even on degenerate
    * all-identical corpora); quantify the dropped mass with
    * [[lshBucketStats]].
    */
  def lshNearPairs(
      corpus: DataFrame,
      bits: Int = 16,
      minCos: Double = 0.95,
      probes: Int = 0,
      dim: Int = 64,
      maxBucket: Int = 256
  ): DataFrame = {
    val sigs = lshBanded(corpus, bits, probes, dim)
    TextOps.boundedBuckets(sigs, Seq("bucket"),
      struct(col("vec_id"), col("embedding")), maxBucket)
      .select(explode(expr(
        """flatten(transform(members, (m, i) ->
          |  transform(slice(members, i + 2, size(members)), n ->
          |    struct(least(m.vec_id, n.vec_id) as vec_a,
          |           greatest(m.vec_id, n.vec_id) as vec_b,
          |           m.embedding as ea, n.embedding as eb))))""".stripMargin)).as("p"))
      .select(col("p.vec_a"), col("p.vec_b"),
        cosineCol(col("p.ea"), col("p.eb")).as("cos"))
      .where(col("cos") >= minCos)
      .dropDuplicates("vec_a", "vec_b")
  }

  /** Embedding-cosine near-duplicate detection = LSH pairs at a high
    * threshold; exposed separately for the dedup suite.
    */
  def embeddingNearDups(corpus: DataFrame, minCos: Double = 0.98): DataFrame =
    lshNearPairs(corpus, bits = 12, minCos = minCos, probes = 2)
}
