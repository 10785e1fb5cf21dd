package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup finds planted duplicates only") {
    val df = docsDf(Seq(
      (1L, "alpha beta gamma"), (2L, "delta"), (3L, "alpha beta gamma"),
      (4L, "unique text here"), (5L, "delta")))
    val groups = TextOps.exactDupGroups(df).collect()
    assert(groups.length == 2)
    assert(groups.map(_.getAs[Long]("cnt")).forall(_ == 2))
    assert(groups.map(_.getAs[Long]("keep_doc_id")).toSet == Set(1L, 2L))
  }

  test("minhash LSH finds near-duplicates, skips dissimilar") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val near = base + " extra"
    val far = (1 to 60).map(i => s"other$i").mkString(" ")
    val df = docsDf(Seq((1L, base), (2L, near), (3L, far)))
    val pairs = TextOps.minhashDupPairs(df, minJaccard = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getAs[Double]("est_jaccard") > 0.7)
  }

  test("simhash hamming distance small for near-dup, large for unrelated") {
    val a = (1 to 100).map(i => s"tok$i").mkString(" ")
    val b = a + " tail"
    val c = (1 to 100).map(i => s"zzz$i").mkString(" ")
    val hab = java.lang.Long.bitCount(TextOps.simhash(a) ^ TextOps.simhash(b))
    val hac = java.lang.Long.bitCount(TextOps.simhash(a) ^ TextOps.simhash(c))
    assert(hab <= 3, s"near-dup hamming $hab")
    assert(hac > 10, s"unrelated hamming $hac")
  }

  test("simhash dup pairs via segment blocking") {
    val a = (1 to 100).map(i => s"tok$i").mkString(" ")
    val df = docsDf(Seq((1L, a), (2L, a + " tail"), (3L, "completely different")))
    val pairs = TextOps.simhashDupPairs(df, maxHamming = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("ngram jaccard: identity 1.0, disjoint 0.0, monotone in overlap") {
    assert(TextOps.ngramJaccard("hello world", "hello world") == 1.0)
    assert(TextOps.ngramJaccard("aaaaaaa", "zzzzzzz") == 0.0)
    val j1 = TextOps.ngramJaccard("the quick brown fox jumps", "the quick brown fox leaps")
    val j2 = TextOps.ngramJaccard("the quick brown fox jumps", "an entirely different text")
    assert(j1 > j2 && j1 > 0.4)
  }

  test("ngram jaccard: sorted-merge kernel and native expression match the set formula") {
    // independent reference: the original boxed-Set formulation
    def ref(a: String, b: String, n: Int = 5): Double = {
      def grams(s: String): Set[Long] =
        if (s == null || s.length < n) Set.empty
        else (0 to s.length - n).map(i => Checksum.xxh64(
          s.substring(i, i + n).getBytes("UTF-8"))).toSet
      val ga = grams(a); val gb = grams(b)
      if (ga.isEmpty && gb.isEmpty) 1.0
      else if (ga.isEmpty || gb.isEmpty) 0.0
      else ga.intersect(gb).size.toDouble / ga.union(gb).size
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox leaps over the lazy dog",
      "aaaaaaaaaa", "abcd", "", "uniécode café text",
      "astral 😀 plane 😀 chars here",
      "repeated repeated repeated repeated")
    for (a <- texts; b <- texts)
      assert(TextOps.ngramJaccard(a, b) == ref(a, b), s"kernel ($a, $b)")
    // native expression == scalar kernel on a DataFrame (and the filter
    // stays inside whole-stage codegen — no UDF barrier)
    GraftFunctions.register(spark)
    val pairs = texts.zipWithIndex.flatMap { case (a, i) =>
      texts.zipWithIndex.map { case (b, j) => (i.toLong * 10 + j, a, b) } }
    import spark.implicits._
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"), call_function("ngram_jaccard", col("a"), col("b"), lit(5)).as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pairs.foreach { case (id, a, b) =>
      assert(got(id) == TextOps.ngramJaccard(a, b), s"expr ($a, $b)") }
  }

  test("fingerprints: deterministic, shift-robust overlap") {
    val t = "the quick brown fox jumps over the lazy dog and keeps running far"
    val f1 = TextOps.fingerprints(t)
    val f2 = TextOps.fingerprints(t)
    assert(f1.sameElements(f2))
    // winnowing: a prefix shift preserves most fingerprints
    val shifted = "XY " + t
    val overlap = f1.toSet.intersect(TextOps.fingerprints(shifted).toSet).size
    assert(overlap >= f1.length / 2, s"overlap $overlap of ${f1.length}")
    assert(TextOps.fingerprints("").isEmpty)
    assert(TextOps.fingerprints(null).isEmpty)
  }

  test("quality + tokcount agree with manual counts") {
    val df = docsDf(Seq((1L, "Hello, World! 42"), (2L, ""), (3L, "  a  b  ")))
    val q = TextOps.quality(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(q(1L).getAs[Int]("n_words") == 3)
    assert(q(2L).getAs[Int]("n_words") == 0)
    assert(q(3L).getAs[Int]("n_words") == 2)
    assert(q(1L).getAs[Int]("n_chars") == 16)
    assert(math.abs(q(1L).getAs[Double]("punct_ratio") - 2.0 / 16) < 1e-9)
  }

  test("langId picks the stopword-dominant language deterministically") {
    val df = docsDf(Seq(
      (1L, "the cat and the dog of the house went to the market"),
      (2L, "der Hund und die Katze und der Vogel nicht hier"),
      (3L, "le chat et les chiens et le jardin des fleurs"),
      (4L, "xyzzy plugh abracadabra")))
    val out = TextOps.langId(df).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "fr")
    assert(out(4L) == "und")
  }

  test("minhash index: incremental dedup against the COMMITTED corpus only") {
    val table = java.nio.file.Files.createTempDirectory("graft_idx_spec").toString
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val other = (1 to 60).map(i => s"other$i").mkString(" ")
    // v1: two committed docs
    val s1 = MinhashIndex.commit(docsDf(Seq((1L, base), (2L, other))), table)
    assert(s1.version == 1 && s1.nDocs == 2 && s1.versions == Seq(1))
    // probe a new batch: near-dup of doc 1, plus an unrelated doc
    val newBatch = docsDf(Seq((100L, base + " extra"), (101L, "zz yy xx ww vv")))
    val p1 = MinhashIndex.incrementalPairs(newBatch, table, minJaccard = 0.5,
        auditDropped = true).collect()
    assert(p1.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 100L)))
    assert(p1.head.getAs[Double]("est_jaccard") > 0.5)
    assert(p1.head.getAs[Long]("dropped_pairs") == 0L)
    // v2: append the probed batch; similar-size versions TIER-MERGE into
    // v3 (logical rewrite — v1/v2 dirs stay for time travel until expire).
    // A later batch dedups against BOTH original commits.
    val s2 = MinhashIndex.commit(newBatch, table)
    assert(s2.version == 3 && s2.nDocs == 4 && s2.versions == Seq(3))
    val p2 = MinhashIndex.incrementalPairs(
      docsDf(Seq((200L, base + " tail"))), table, minJaccard = 0.5).collect()
    assert(p2.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 200L), (100L, 200L)))
    // time travel: probing AS OF v1 must not see v2's docs
    val p1again = MinhashIndex.incrementalPairs(
      docsDf(Seq((200L, base + " tail"))), table, minJaccard = 0.5,
      asOfVersion = Some(1)).collect()
    assert(p1again.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 200L)))
    // commit-conflict law: a snapshot version is immutable once committed
    intercept[SnapshotConflictException] {
      MinhashIndex.at(spark, table, 2).foreach { _ =>
        // force a version collision by replaying version 2's write
        val m = MinhashIndex.getClass.getDeclaredMethod(
          "write", classOf[org.apache.spark.sql.SparkSession],
          classOf[String], classOf[MinhashIndexSnapshot])
        m.setAccessible(true)
        try m.invoke(MinhashIndex, spark, table, s2)
        catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
      }
    }
    // parameter mismatch fails closed
    intercept[IllegalArgumentException] {
      MinhashIndex.commit(docsDf(Seq((300L, "a b c"))), table, k = 32, bands = 8)
    }
  }

  test("minhash index: oversized committed buckets are capped with in-band audit") {
    val table = java.nio.file.Files.createTempDirectory("graft_idx_cap").toString
    // 8 identical committed docs -> every band bucket has 8 members
    val dupText = (1 to 40).map(i => s"boiler$i").mkString(" ")
    MinhashIndex.commit(docsDf((1L to 8L).map(i => (i, dupText))), table)
    val probe = docsDf(Seq((500L, dupText)))
    // cap below the bucket size: all candidates dropped, audit > 0
    val capped = MinhashIndex.incrementalPairs(probe, table, minJaccard = 0.5,
      maxBucket = 4, auditDropped = true)
    val rows = capped.collect()
    assert(rows.isEmpty) // every committed bucket oversized -> no pairs survive
    // cap above: all 8 pair up, audit 0
    val open = MinhashIndex.incrementalPairs(probe, table, minJaccard = 0.5,
      maxBucket = 64, auditDropped = true).collect()
    assert(open.map(_.getLong(0)).toSet == (1L to 8L).toSet)
    assert(open.forall(_.getAs[Long]("dropped_pairs") == 0L))
  }

  test("minhash index: tier-merged version count stays logarithmic; expire reclaims") {
    val table = java.nio.file.Files.createTempDirectory("graft_idx_tier").toString
    // 6 equal-size commits: one dir per commit would be 6 live versions;
    // size-tiered merging must keep the live list well below that while
    // dedup results stay identical to the unmerged union
    var nextId = 0L
    def batch() = {
      val docs = (1 to 4).map { _ =>
        nextId += 1
        (nextId, (1 to 50).map(i => s"w${nextId}x$i").mkString(" "))
      }
      docsDf(docs)
    }
    var snap = MinhashIndex.commit(batch(), table)
    (1 to 5).foreach(_ => snap = MinhashIndex.commit(batch(), table))
    assert(snap.nDocs == 24)
    assert(snap.versions.length <= 3, s"live versions ${snap.versions}")
    assert(snap.versionBytes.length == snap.versions.length)
    // geometric invariant: each older version >2x the next newer
    snap.versionBytes.sliding(2).foreach {
      case Seq(a, b) => assert(b * 2 < a, s"sizes not geometric: ${snap.versionBytes}")
      case _ => ()
    }
    // merged data is the full corpus: a replayed committed doc still pairs
    val probeDoc = docsDf(Seq((900L, (1 to 50).map(i => s"w7x$i").mkString(" "))))
    val pairs = MinhashIndex.incrementalPairs(probeDoc, table, minJaccard = 0.8).collect()
    assert(pairs.map(_.getLong(0)).toSet == Set(7L))
    // pre-merge snapshots stay readable until expire (Iceberg semantics) ...
    val preMerge = MinhashIndex.at(spark, table, 1)
    assert(preMerge.isDefined)
    assert(MinhashIndex.buckets(spark, table, preMerge.get).count() > 0)
    // ... and expire physically reclaims merged-away dirs + old snapshots
    val deleted = MinhashIndex.expire(spark, table)
    assert(deleted > 0)
    assert(MinhashIndex.at(spark, table, 1).isEmpty) // time-travel floor moved
    val after = MinhashIndex.latest(spark, table).get
    assert(after.version == snap.version && after.nDocs == 24)
    // the live index still answers probes identically after reclamation
    val pairs2 = MinhashIndex.incrementalPairs(probeDoc, table, minJaccard = 0.8).collect()
    assert(pairs2.map(_.getLong(0)).toSet == Set(7L))
    // only live version dirs remain on disk
    val dataRoot = new java.io.File(table, "data")
    val liveDirs = dataRoot.listFiles().map(_.getName).toSet
    assert(liveDirs == after.versions.map(v => f"v$v%05d").toSet)
  }
}
