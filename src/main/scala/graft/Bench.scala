package graft

import org.apache.spark.sql.{SparkSession, functions => F}

/** Benchmark driver (driver contract: prints ONE JSON line).
  *
  * Measures the BASELINE.md metrics:
  *  - encode throughput (M tokens/s) on the deterministic fixture table at
  *    local[2] vs local[8] — the sandbox stand-in for N vs 4N executors
  *    (BASELINE.json north_rule; both levels below the box's shared
  *    memory-bandwidth saturation) — plus scaling efficiency
  *    thr(8) / (4 x thr(2)), and local[24] as the box peak;
  *  - multi-JVM scaling via local-cluster[2] vs local-cluster[8] child runs
  *    (separate single-core executor JVMs, real shuffle ser/deser);
  *  - decode throughput, partition work balance (skew evidence),
  *    compression ratio raw/encoded and the codec mix, the zdict leg's
  *    ratio on a dict-friendly fixture;
  *  - per-query wall times for every SparkEntry query at SPARK_GRAFT_CPUS.
  *
  * Output contract (round-3 verdict item 1): the machine-parsed stdout line
  * must fit the driver's bounded tail capture, so the LAST stdout line is a
  * COMPACT headline JSON (no per-query map, no prose fields). The full
  * record — per-query seconds plus everything in the headline — is written
  * to BENCH_LOCAL.json.
  *
  * Section order is contamination-aware (round-3 verdict item 2): all
  * page-cache-sensitive local measurements (scaling rounds, peak, decode,
  * per-query) run BEFORE the >=400M-token cluster fixture is written and
  * the cluster legs hammer the box.
  */
object Bench {

  /** Shuffle dir for every bench JVM (parent sessions AND cluster
    * children): tmpfs. The sandbox root disk sustains only ~450 MB/s and
    * throttles under sustained writeback — repeated ~1 GB shuffle writes
    * made successive reps degrade monotonically (leg2 18.0 -> 38.7 s over
    * 4 reps; stable 17.4-19.3 s on tmpfs). A real cluster's shuffle tier
    * is striped node-local NVMe; measuring the engine against this box's
    * burst-credit budget would grade the sandbox, not the code.
    */
  private val shuffleDir: String = {
    val d = if (new java.io.File("/dev/shm").isDirectory)
      "/dev/shm/graft_bench_shuffle" else s"${sys.props("java.io.tmpdir")}/graft_bench_shuffle"
    new java.io.File(d).mkdirs()
    d
  }

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", shuffleDir)
      // local bench inputs are a few hundred MB; default 128 MB splits
      // would give the scan stage fewer tasks than cores (on a real
      // cluster the default is right — inputs are TBs)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1 * 1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def stop(s: SparkSession): Unit = {
    s.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  /** Encode the fixture parquet end-to-end (scan -> route -> encode ->
    * metrics agg) against a precomputed plan — production runs reuse the
    * plan persisted in snapshot v0 (manifest), so it is not part of the
    * steady-state encode cost; its one-time cost is reported separately.
    * Returns (seconds, tokens, rawBytes, encodedBytes, codecMix).
    */
  private def encodeRun(s: SparkSession, inputPath: String, opts: EncodeOptions,
                        plan: PartitionPlan)
      : (Double, Long, Long, Long, Map[String, Long]) = {
    import org.apache.spark.sql.Encoders
    val ds = s.read.parquet(inputPath).as[TokenRow](Encoders.product[TokenRow])
    val comp = TokenCompressor(opts)
    val t0 = System.nanoTime()
    val agg = comp.encodeWithPlan(ds, plan, None).toDF().groupBy("codec").agg(
      F.sum("n_tokens").as("toks"),
      F.sum("raw_bytes").as("raw"),
      F.sum("encoded_bytes").as("enc"),
      F.count(F.lit(1)).as("blocks"))
      .collect()
    val sec = (System.nanoTime() - t0) / 1e9
    val toks = agg.map(_.getAs[Long]("toks")).sum
    val raw = agg.map(_.getAs[Long]("raw")).sum
    val enc = agg.map(_.getAs[Long]("enc")).sum
    val mix = agg.map(r => r.getAs[String]("codec") -> r.getAs[Long]("blocks")).toMap
    (sec, toks, raw, enc, mix)
  }

  private def fmtArr(xs: Seq[Double]): String =
    xs.map(e => f"$e%.3f").mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // fixture sizing from the input's actual row count (events is the table
    // that scales with sf), not sf-substring matching: ~2.4 fixture docs
    // (~677 tok each) per event row => ~162M tokens at sf0.1. Floor of
    // 120k docs (~81M tokens): below that a local[2] encode run finishes
    // in under ~2 s and fixed per-job cost (plan broadcast, stage setup)
    // dominates, so small-sf runs would measure overhead, not the engine
    // (sf0.01's natural 24k docs read as local24 39 MTok/s / eff 0.69 —
    // pure job-size artifact)
    var nDocs = 120000L
    var planSec = 0.0
    val opts = EncodeOptions(numParts = 128, sampleMod = 16)
    var plan: PartitionPlan = null
    locally {
      val s = session(cpus)
      try {
        nDocs = try {
          val events = s.read.parquet(s"$sfDir/events.parquet").count()
          math.max(120000L, events * 12L / 5L)
        } catch { case _: Throwable => 120000L }
      } finally stop(s)
    }

    // 1) materialize the deterministic fixture once (identical input for
    //    both parallelism levels), then compute the partition plan ONCE in
    //    a dedicated timed step (plan_sec is this canonical measurement;
    //    the plan value is reused by every level below)
    val fixturePath = s"${sys.props("java.io.tmpdir")}/graft_bench_fixture_$nDocs"
    locally {
      val s = session(cpus)
      try {
        import org.apache.spark.sql.Encoders
        if (!new java.io.File(fixturePath, "_SUCCESS").exists()) {
          Fixtures.tokenTable(s, nDocs, partitions = 64)
            .write.mode("overwrite").parquet(fixturePath)
        }
        val ds = s.read.parquet(fixturePath).as[TokenRow](Encoders.product[TokenRow])
        val tp = System.nanoTime()
        plan = Planner.plan(ds, opts)
        planSec = (System.nanoTime() - tp) / 1e9
      } finally stop(s)
    }

    // 2) scaling experiment. N vs 4N executors is evidenced in-sandbox by
    // local[2] vs local[8] — both levels stay below this single box's
    // memory-bandwidth saturation, mirroring a real cluster where 4N
    // executors bring 4N bandwidth. local[24] is additionally reported as
    // the box's peak (not 32: with all 32 cores taken, GC/OS/daemon
    // threads oversubscribe and throughput collapses erratically; 24
    // leaves them headroom. The 8->24 pair also shares one memory bus,
    // so it under-reads true cluster scaling).
    def atCores(cores: Int, reps: Int): (Double, Long, Long, Long, Map[String, Long]) = {
      val s = session(cores)
      try {
        val runs = (1 to reps).map(_ => encodeRun(s, fixturePath, opts, plan))
        runs.minBy(_._1)
      } finally stop(s)
    }
    // Convergence-based reps (both legs, same policy): rep until the two
    // fastest agree within 5% (>= minReps, <= maxReps). Box noise is
    // ONE-SIDED — a co-tenant window only ever ADDS time — so a leg whose
    // reps disagree hasn't yet shown its floor, and granting IT extra reps
    // corrects the disadvantage rather than flattering a leg (the fixed
    // equal-reps design protected against unequal-rep min bias, but let a
    // single load window own a whole leg and skew that round's ratio).
    def atCoresConverged(cores: Int, minReps: Int, maxReps: Int)
        : (Double, Long, Long, Long, Map[String, Long]) = {
      val s = session(cores)
      try {
        val runs = scala.collection.mutable.ArrayBuffer
          .empty[(Double, Long, Long, Long, Map[String, Long])]
        var go = true
        while (go) {
          runs += encodeRun(s, fixturePath, opts, plan)
          val sorted = runs.map(_._1).sorted
          go = runs.length < minReps ||
            (runs.length < maxReps && sorted(1) / sorted(0) > 1.05)
        }
        runs.minBy(_._1)
      } finally stop(s)
    }
    // JIT + page-cache warmup at every level (shared JVM => shared JIT;
    // C2 needs several full passes), discarded
    atCores(24, 2); atCores(8, 2); atCores(2, 1)
    // Paired-round design: each round measures BOTH levels back to back
    // (min of 2 reps each), so background-load windows on this shared box
    // hit the two levels of a round together and mostly cancel in the
    // round's efficiency ratio. Leg order ALTERNATES between rounds
    // ((2,8),(8,2),(2,8),...) so slow environmental drift (page cache,
    // thermal, co-tenant load ramps) biases successive rounds in opposite
    // directions instead of accumulating one-sided. The headline scaling
    // efficiency is the MEDIAN of the per-round ratios — robust to a noisy
    // round in either direction — alongside the min-of-all-reps
    // throughputs per level. Rounds whose ratio falls outside [0.5, 1.3]
    // hit a shared-box load spike in ONE leg (round-2 saw a 2.565 sample)
    // — discard and re-run, but RECORD the discarded values (a build whose
    // scaling genuinely collapsed must not have its evidence vanish).
    var best2: (Double, Long, Long, Long, Map[String, Long]) = null
    var best8: (Double, Long, Long, Long, Map[String, Long]) = null
    val effSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val effDiscarded = scala.collection.mutable.ArrayBuffer.empty[Double]
    var localRound = 0
    while (effSamples.length < 5 && localRound < 8) {
      localRound += 1
      val (r2, r8) =
        if (localRound % 2 == 1) {
          val a = atCoresConverged(2, 2, 4); val b = atCoresConverged(8, 2, 4); (a, b)
        } else {
          val b = atCoresConverged(8, 2, 4); val a = atCoresConverged(2, 2, 4); (a, b)
        }
      val eff = (r8._2 / r8._1) / (4.0 * (r2._2 / r2._1))
      // gate [0.5, 1.3]: quiet-box samples run 0.74-1.0; a ratio below
      // 0.5 means a co-tenant load window swallowed every rep of ONE leg
      // (a 0.342 sample from exactly that dragged a 5-round median to
      // 0.79). Discarded values are recorded in the JSON, so a build
      // whose scaling genuinely collapsed still shows its evidence — and
      // a box hammered for all 8 rounds still reports (ungated) rather
      // than crashing on an empty sample set
      if ((eff >= 0.5 && eff <= 1.3) || (effSamples.isEmpty && localRound == 8)) {
        effSamples += eff
        if (best2 == null || r2._1 < best2._1) best2 = r2
        if (best8 == null || r8._1 < best8._1) best8 = r8
      } else effDiscarded += eff
    }
    val (sec2, toks2, _, _, _) = best2
    val (sec8, toks8, _, _, _) = best8
    val (sec24, toks24, raw24, enc24, mix) = atCores(24, 6)

    // 2c) decode throughput + partition-balance histogram (skew evidence)
    // at 24 — BEFORE the cluster section pollutes the page cache
    var thrDec = 0.0
    var thrRec = 0.0
    var skewMaxOverAvg = 0.0
    locally {
      import org.apache.spark.sql.Encoders
      val s = session(24)
      try {
        val ds = s.read.parquet(fixturePath).as[TokenRow](Encoders.product[TokenRow])
        val comp = TokenCompressor(opts)
        val blocksPath = s"$fixturePath.blocks"
        comp.encodeWithPlan(ds, plan, None).toDF()
          .write.mode("overwrite").parquet(blocksPath)
        // work balance: tokens routed per partition (encoded-bytes balance
        // is not meaningful — compressibility legitimately differs by
        // source; the planner balances work, i.e. tokens)
        val perPart = s.read.parquet(blocksPath)
          .groupBy("part_id").agg(F.sum("n_tokens").as("b"))
          .collect().map(_.getAs[Long]("b"))
        skewMaxOverAvg = perPart.max.toDouble / (perPart.sum.toDouble / perPart.length)
        val cols = Encoders.product[EncodedBlock].schema.fieldNames.map(F.col)
        def decodeOnce(): Double = {
          val blocks = s.read.parquet(blocksPath)
            .select(cols.toIndexedSeq: _*).as[EncodedBlock](Encoders.product[EncodedBlock])
          val t0 = System.nanoTime()
          val n = comp.decode(blocks).toDF().agg(F.sum("n_tok")).head().getLong(0)
          n / ((System.nanoTime() - t0) / 1e9) / 1e6
        }
        decodeOnce() // warm
        thrDec = (1 to 3).map(_ => decodeOnce()).max
        // narrow policy-migration path: decode + re-encode with NO exchange
        def recompressOnce(): Double = {
          val blocks = s.read.parquet(blocksPath)
            .select(cols.toIndexedSeq: _*).as[EncodedBlock](Encoders.product[EncodedBlock])
          val t0 = System.nanoTime()
          val n = comp.recompress(blocks, verify = false).toDF()
            .agg(F.sum("n_tokens")).head().getLong(0)
          n / ((System.nanoTime() - t0) / 1e9) / 1e6
        }
        recompressOnce() // warm
        thrRec = (1 to 2).map(_ => recompressOnce()).max
      } finally stop(s)
    }

    // 2d) zdict leg (round-3 verdict item 6): measured ratio ON vs OFF on
    // the dict-friendly motif fixture — each 64-doc block is 64 distinct
    // shared motifs (no within-block history for plain zstd, full
    // cross-block redundancy for the per-partition dictionary). codec
    // policy pinned to plain so the ratio isolates the outer-frame dict.
    var zdictRatioOn = 0.0
    var zdictRatioOff = 0.0
    locally {
      val s = session(24)
      try {
        import org.apache.spark.sql.Encoders
        val motifPath = s"${sys.props("java.io.tmpdir")}/graft_bench_motif_100k"
        if (!new java.io.File(motifPath, "_SUCCESS").exists()) {
          Fixtures.motifTable(s, 100000L, partitions = 32)
            .write.mode("overwrite").parquet(motifPath)
        }
        val zBase = EncodeOptions(codecPolicy = "plain", numParts = 32,
          sampleMod = 4, blockTokens = 1 << 12)
        def ratio(o: EncodeOptions): Double = {
          val ds = s.read.parquet(motifPath).as[TokenRow](Encoders.product[TokenRow])
          val zPlan = Planner.plan(ds, o)
          val r = TokenCompressor(o).encodeWithPlan(ds, zPlan, None).toDF()
            .agg(F.sum("raw_bytes").as("raw"), F.sum("encoded_bytes").as("enc")).head()
          r.getAs[Long]("raw").toDouble / r.getAs[Long]("enc")
        }
        zdictRatioOff = ratio(zBase)
        zdictRatioOn = ratio(zBase.copy(zdictBlocks = 8))
      } finally stop(s)
    }

    // 3) per-query timings at the driver-configured parallelism — still
    // before the cluster section
    val s3 = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(s3, sfDir).count() catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, sec, n)
    }
    stop(s3)

    // 4) multi-JVM scaling evidence: local-cluster[N,1,mem] forks N
    // SEPARATE single-core executor JVMs (per-executor heaps, real shuffle
    // serialization + netty fetch) — the faithful in-sandbox proxy for two
    // real cluster sizes (north rule: N vs 4N executors = 2 vs 8 workers).
    // The job is size-multiplied so the fast leg's wall time sits well
    // above fixed per-job cost (scheduling, plan broadcast, stage setup).
    // >=5 valid paired rounds (round-3's 3 samples spread 0.45-0.92 — too
    // few to median), leg order alternating per round, ratios outside
    // [0.5, 1.3] discarded-but-recorded, and the min-based ratio reported
    // alongside the median. Child JVMs are used because standalone workers
    // fork executors via $SPARK_HOME/bin/spark-class. Runs LAST: writing
    // the >=400M-token fixture + 10 cluster jobs evicts the page cache.
    // >=800M tokens: at 8 single-core executors a leg run is ~11 s, so the
    // ~0.3-0.5 s fixed per-job cost (scheduling, plan broadcast, stage
    // setup) is <5% of the fast leg instead of ~9% at 400M — fixed cost is
    // serial-fraction noise that reads as false scaling loss
    val estTokens = nDocs * 680L // fixture is ~677 tokens/doc
    val clusterRepeat = math.max(1L, (800L * 1000 * 1000 + estTokens - 1) / estTokens)
      .min(32L).toInt
    val haveSparkHome = new java.io.File("/opt/spark/bin/spark-class").exists()
    // one real >=400M-token fixture (distinct doc_ids, one parquet scan) —
    // NOT a unionAll multiplier: a 25-branch union plan re-broadcasts per
    // stage and floods the driver with tiny scan tasks, which showed up as
    // a ~3.4 s serial term that capped measured 2->8 scaling at ~0.68
    val clusterDocs = nDocs * clusterRepeat
    val clusterFixture = s"${sys.props("java.io.tmpdir")}/graft_bench_fixture_$clusterDocs"
    if (haveSparkHome && !new java.io.File(clusterFixture, "_SUCCESS").exists()) {
      val s = session(cpus)
      Fixtures.tokenTable(s, clusterDocs, partitions = 128)
        .write.mode("overwrite").parquet(clusterFixture)
      stop(s)
    }
    def clusterLeg(workers: Int): Option[(Double, Long)] = {
      val javaBin = s"${System.getProperty("java.home")}/bin/java"
      // SAME convergence policy per leg (min 3 reps, max 5, stop when the
      // two fastest agree within 5%): box noise only ADDS time, so extra
      // reps go to whichever leg a load window hit — correcting that
      // round's ratio instead of letting one slow leg own it. (The old
      // fixed-equal-reps design guarded against unequal-rep min bias, but
      // round medians swung 0.71-0.88 across otherwise identical runs
      // because a single window could inflate all 3 reps of one leg.)
      val reps = "5"
      val pb = new ProcessBuilder(javaBin, "-Xmx4g",
        s"-Dspark.local.dir=$shuffleDir",
        // forward the rep-budget knob so tuning it on the parent run
        // actually reaches the child that reads it
        s"-Dgraft.repBudgetSec=${sys.props.getOrElse("graft.repBudgetSec", "360")}",
        "-cp",
        System.getProperty("java.class.path"), "graft.BenchCluster",
        clusterFixture, workers.toString, reps)
      pb.environment().put("SPARK_HOME", "/opt/spark")
      pb.environment().put("SPARK_SCALA_VERSION", "2.13")
      // files, not pipes: Spark writes MBs of INFO/WARN to the child's
      // stderr; an unread 64 KiB pipe buffer deadlocks the child against a
      // blocking stdout read in this parent. Hard timeout as a backstop.
      val tmp = sys.props("java.io.tmpdir")
      val outFile = new java.io.File(tmp, s"graft_cluster_$workers.out")
      val errFile = new java.io.File(tmp, s"graft_cluster_$workers.err")
      pb.redirectOutput(ProcessBuilder.Redirect.to(outFile))
      pb.redirectError(ProcessBuilder.Redirect.to(errFile))
      try {
        val p = pb.start()
        val done = p.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)
        if (!done) { p.destroyForcibly(); p.waitFor(); None }
        else {
          val out = java.nio.file.Files.readString(outFile.toPath)
          out.linesIterator.find(_.startsWith("GRAFT_CLUSTER_RESULT")).map { l =>
            val sec = """"sec":([0-9.]+)""".r.findFirstMatchIn(l).get.group(1).toDouble
            val tok = """"tokens":([0-9]+)""".r.findFirstMatchIn(l).get.group(1).toLong
            (sec, tok)
          }
        }
      } catch { case _: Throwable => None }
    }
    val clusterSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val clusterDiscarded = scala.collection.mutable.ArrayBuffer.empty[Double]
    var clusterLegFailures = 0
    var clusterBest2 = Double.MaxValue
    var clusterBest8 = Double.MaxValue
    var clusterToks = 0L
    var round = 0
    while (haveSparkHome && clusterSamples.length < 5 && round < 8) {
      round += 1
      val legs =
        if (round % 2 == 1) (clusterLeg(2), clusterLeg(8))
        else { val b = clusterLeg(8); val a = clusterLeg(2); (a, b) }
      legs match {
        case (Some((s2, t2)), Some((s8, _))) =>
          val eff = (t2 / s8) / (4.0 * (t2 / s2))
          // same gate + same ungated last-round fallback as the local
          // loop: a build whose scaling genuinely collapsed reports its
          // (bad) number rather than looking like the section never ran
          if ((eff >= 0.5 && eff <= 1.3) ||
              (clusterSamples.isEmpty && round == 8)) {
            clusterSamples += eff
            clusterBest2 = math.min(clusterBest2, s2)
            clusterBest8 = math.min(clusterBest8, s8)
            clusterToks = t2
          } else clusterDiscarded += eff
        case (a, b) => // child(ren) failed/killed; retry within the round budget
          clusterLegFailures += Seq(a, b).count(_.isEmpty)
      }
    }
    val clusterEff =
      if (clusterSamples.isEmpty) Double.NaN
      else clusterSamples.sorted.apply(clusterSamples.length / 2)
    val thr2 = toks2 / sec2 / 1e6
    val thr8 = toks8 / sec8 / 1e6
    val thr24 = toks24 / sec24 / 1e6
    val sortedEff = effSamples.sorted
    val scalingEff = sortedEff(sortedEff.length / 2) // median of paired rounds
    val scalingEffMin = thr8 / (4.0 * thr2)
    val scalingEff8to24 = thr24 / (3.0 * thr8)
    val ratio = raw24.toDouble / enc24

    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val mixJson = mix.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // headline metrics shared by the compact contract line and the full
    // BENCH_LOCAL.json record
    val clusterPart =
      if (!clusterEff.isNaN) {
        val thrC2 = clusterToks / clusterBest2 / 1e6
        val thrC8 = clusterToks / clusterBest8 / 1e6
        val effCMin = thrC8 / (4.0 * thrC2)
        f""""scaling_efficiency_local_cluster":$clusterEff%.3f,""" +
        f""""scaling_efficiency_local_cluster_minbased":$effCMin%.3f,""" +
        s""""scaling_cluster_samples":${fmtArr(clusterSamples.toSeq)},""" +
        s""""scaling_cluster_discarded":${fmtArr(clusterDiscarded.toSeq)},""" +
        s""""cluster_leg_failures":$clusterLegFailures,""" +
        f""""encode_mtok_s_cluster2":$thrC2%.1f,"encode_mtok_s_cluster8":$thrC8%.1f,""" +
        s""""cluster_job_tokens":$clusterToks,"""
      } else if (clusterDiscarded.nonEmpty || clusterLegFailures > 0)
        // every completed pair was out-of-gate AND the fallback never got
        // a completed round 8 (child failures): surface the evidence
        // anyway instead of looking like the section never ran
        s""""scaling_efficiency_local_cluster":null,""" +
        s""""scaling_cluster_discarded":${fmtArr(clusterDiscarded.toSeq)},""" +
        s""""cluster_leg_failures":$clusterLegFailures,"""
      else ""
    val headline =
      f""""encode_mtok_s_local2":$thr2%.1f,"encode_mtok_s_local8":$thr8%.1f,""" +
      f""""encode_mtok_s_local24":$thr24%.1f,""" +
      f""""scaling_efficiency":$scalingEff%.3f,""" +
      s""""scaling_efficiency_samples":${fmtArr(effSamples.toSeq)},""" +
      s""""scaling_efficiency_discarded":${fmtArr(effDiscarded.toSeq)},""" +
      f""""scaling_efficiency_minbased":$scalingEffMin%.3f,""" +
      f""""scaling_efficiency_8to24":$scalingEff8to24%.3f,""" +
      clusterPart +
      f""""compression_ratio":$ratio%.3f,""" +
      f""""compression_ratio_zdict":$zdictRatioOn%.3f,""" +
      f""""compression_ratio_zdict_off":$zdictRatioOff%.3f,""" +
      f""""decode_mtok_s_local24":$thrDec%.1f,""" +
      f""""recompress_mtok_s_local24":$thrRec%.1f,""" +
      f""""part_tokens_max_over_avg":$skewMaxOverAvg%.2f,""" +
      f""""plan_sec":$planSec%.2f,""" +
      s""""bench_tokens":$toks24,"raw_bytes":$raw24,"encoded_bytes":$enc24,""" +
      s""""codec_mix":$mixJson"""
    // full record: everything + the per-query map + prose provenance
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""scaling_pair":"local[2]->local[8] (N->4N cores, below the single-box memory-bandwidth ceiling)",""" +
      s""""scaling_cluster_pair":"local-cluster[2,1,3g] -> local-cluster[8,1,3g] (N->4N separate single-core executor JVMs, real shuffle ser/deser)",""" +
      headline + "}"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), fullJson + "\n")
    // the contract line (fork + StdoutOutput => no sbt prefix): compact —
    // per-query seconds live in BENCH_LOCAL.json (queries_file) so this
    // line survives the driver's bounded tail capture. Printed LAST.
    val contract =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
      s""""n_queries":${results.length},"queries_file":"BENCH_LOCAL.json",""" +
      headline + "}"
    println(contract)
    // tmpfs hygiene: sessions clean their own spark-* subdirs on stop(),
    // but a killed child would leak RAM-backed files across runs
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(): Unit
    }
    new java.io.File(shuffleDir).listFiles() match {
      case null => ()
      case fs => fs.foreach(rmTree)
    }
  }
}
