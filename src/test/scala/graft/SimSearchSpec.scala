package graft

import org.scalatest.funsuite.AnyFunSuite

class SimSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def vecs(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def unit(dim: Int, axis: Int, noise: Double = 0.0, seed: Int = 1): Array[Float] = {
    val r = new scala.util.Random(seed)
    val v = Array.tabulate(dim)(i =>
      (if (i == axis) 1.0 else 0.0) + noise * r.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  test("brute-force top-k ranks an exact duplicate first") {
    val dim = 16
    val corpus = vecs(Seq(
      (1L, unit(dim, 0)), (2L, unit(dim, 0)), // duplicates of each other
      (3L, unit(dim, 1)), (4L, unit(dim, 2)),
      (5L, unit(dim, 0, noise = 0.05, seed = 7))))
    val queries = corpus.where("vec_id = 1")
    val top = SimSearch.bruteForceTopK(corpus, queries, k = 3).collect()
    assert(top.length == 3)
    val first = top.find(_.getAs[Int]("rank") == 1).get
    assert(first.getAs[Long]("neighbor_id") == 2L)
    assert(math.abs(first.getAs[Double]("cos") - 1.0) < 1e-6)
    val second = top.find(_.getAs[Int]("rank") == 2).get
    assert(second.getAs[Long]("neighbor_id") == 5L) // noisy near-dup
  }

  test("lsh near pairs finds planted near-duplicates") {
    val dim = 64
    val rows = (0 until 40).map(i => (i.toLong, unit(dim, i % 16, 0.02, seed = i))) ++
      Seq((100L, unit(dim, 3, 0.001, seed = 900)), (101L, unit(dim, 3, 0.001, seed = 901)))
    val pairs = SimSearch.lshNearPairs(vecs(rows), bits = 10, minCos = 0.98,
      probes = 4, dim = dim).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((100L, 101L)), s"expected planted pair in $found")
    pairs.foreach(r => assert(r.getAs[Double]("cos") >= 0.98))
  }

  test("signatures are deterministic") {
    val planes = SimSearch.hyperplanes(16, 8)
    val planes2 = SimSearch.hyperplanes(16, 8)
    assert(planes.flatMap(_.toSeq).sameElements(planes2.flatMap(_.toSeq)))
    val v = unit(8, 2)
    assert(SimSearch.signature(v, planes) == SimSearch.signature(v, planes2))
  }

  test("IVF: full-probe search equals brute force; same-direction vectors share cells") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val vecs = (0L until 120L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.orderBy("vec_id").limit(5)
    val cents = SimSearch.ivfCentroids(corpus, kCells = 4, iters = 3)
    // determinism: retraining yields identical centroids
    val cents2 = SimSearch.ivfCentroids(corpus, kCells = 4, iters = 3)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq)
    // probing EVERY cell must reproduce exact brute-force top-k
    val ivf = SimSearch.ivfTopK(corpus, queries, k = 3, kCells = 4, nprobe = 4,
        cents = Some(cents))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val bf = SimSearch.bruteForceTopK(corpus, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == bf)
    // scaled copy = same direction = same cell, and its top-1 is the original
    import org.apache.spark.sql.functions.col
    val scaled = corpus.where(col("vec_id") === 7L)
      .select((col("vec_id") + 500L).as("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          v => v * org.apache.spark.sql.functions.lit(2.0f)).as("embedding"))
    val hit = SimSearch.ivfTopK(corpus, scaled, k = 1, kCells = 4, nprobe = 1,
        cents = Some(cents)).collect()
    assert(hit.length == 1 && hit.head.getLong(2) == 7L)
    assert(math.abs(hit.head.getDouble(3) - 1.0) < 1e-9)
  }

  test("native cosine_sim expression equals the Column formula bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(29)
    val vecs = (0L until 400L).map(i =>
      (i, Array.fill(64)(rng.nextGaussian().toFloat),
          Array.fill(64)(rng.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "a", "b")
    val rows = df.select(
      SimSearch.cosineCol(col("a"), col("b")).as("native"),
      SimSearch.cosineColReference(col("a"), col("b")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("IVF index persists in the snapshot manifest: reload, no retrain, time travel") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val corpus = (0L until 300L)
      .map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.limit(5)
    val table = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString

    val trained = SimSearch.IvfIndex.build(corpus, table, kCells = 4, iters = 2)
    // reload is a driver-side metadata read and returns the exact floats
    val loaded = SimSearch.IvfIndex.load(spark, table).get
    assert(loaded.length == trained.length &&
      loaded.zip(trained).forall { case (a, b) => a.sameElements(b) })
    // NO training job: the persisted-index query must run exactly as many
    // Spark jobs as the same query with in-memory centroids (training adds
    // a seed collect + one job per Lloyd round on top)
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    def countJobs(body: => Seq[org.apache.spark.sql.Row]): (Seq[org.apache.spark.sql.Row], Int) = {
      spark.sparkContext.addSparkListener(listener)
      try {
        counter.set(0)
        val out = body
        Thread.sleep(300) // let queued listener events drain
        (out, counter.get())
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val (fresh, freshJobs) = countJobs(
      SimSearch.ivfTopK(corpus, queries, k = 3, kCells = 4, nprobe = 2,
        cents = Some(trained)).collect().toSeq)
    val (viaIndex, indexJobs) = countJobs(
      SimSearch.IvfIndex.topK(corpus, queries, table, k = 3, nprobe = 2)
        .collect().toSeq)
    assert(viaIndex == fresh)
    assert(indexJobs <= freshJobs,
      s"persisted-index query ran $indexJobs jobs vs $freshJobs — retraining?")

    // retrain on a shifted corpus -> v+1; the OLD index stays addressable
    val v0 = ManifestIO.latest(spark, table).get.version
    val corpus2 = corpus.withColumn("embedding",
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.col("embedding"), x => x * 2f))
    SimSearch.IvfIndex.build(corpus2, table, kCells = 4, iters = 2)
    assert(ManifestIO.latest(spark, table).get.version == v0 + 1)
    val old = SimSearch.IvfIndex.load(spark, table, Some(v0)).get
    assert(old.zip(trained).forall { case (a, b) => a.sameElements(b) })
  }

  test("empty corpus: ivfCentroids returns no centroids, ivfTopK no rows") {
    val empty = vecs(Seq.empty)
    assert(SimSearch.ivfCentroids(empty, kCells = 4, iters = 2).isEmpty)
    assert(SimSearch.ivfTopK(empty, empty, k = 3, kCells = 4).count() == 0L)
  }
}
