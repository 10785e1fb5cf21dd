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
  *  - decode throughput, partition work balance (skew evidence),
  *    compression ratio raw/encoded and the codec mix;
  *  - per-query wall times for every SparkEntry query at SPARK_GRAFT_CPUS.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nDocs: Long =
      if (sfDir.contains("sf0.1")) 240000L // ~162M tokens
      else if (sfDir.contains("sf0.01")) 24000L
      else 2000L

    // 1) materialize the deterministic fixture once (identical input for
    //    both parallelism levels)
    val fixturePath = s"${sys.props("java.io.tmpdir")}/graft_bench_fixture_$nDocs"
    locally {
      val s = session(cpus)
      if (!new java.io.File(fixturePath, "_SUCCESS").exists()) {
        Fixtures.tokenTable(s, nDocs, partitions = 64)
          .write.mode("overwrite").parquet(fixturePath)
      }
      stop(s)
    }

    // 2) scaling experiment. N vs 4N executors is evidenced in-sandbox by
    // local[2] vs local[8] — both levels stay below this single box's
    // memory-bandwidth saturation, mirroring a real cluster where 4N
    // executors bring 4N bandwidth. local[24] is additionally reported as
    // the box's peak (not 32: with all 32 cores taken, GC/OS/daemon
    // threads oversubscribe and throughput collapses erratically; 24
    // leaves them headroom. The 8->24 pair also shares one memory bus,
    // so it under-reads true cluster scaling).
    // sampleMod=16 => ~117 sampled docs per boundary at this fixture size
    // (token-balance max/avg ~1.2); at 10^12 rows you raise sampleMod so
    // the collected sample stays ~10^7-10^8
    val opts = EncodeOptions(numParts = 128, sampleMod = 16)
    var planSec = 0.0
    def atCores(cores: Int, reps: Int): (Double, Long, Long, Long, Map[String, Long]) = {
      val s = session(cores)
      try {
        import org.apache.spark.sql.Encoders
        val ds = s.read.parquet(fixturePath).as[TokenRow](Encoders.product[TokenRow])
        val tp = System.nanoTime()
        val plan = Planner.plan(ds, opts)
        planSec = (System.nanoTime() - tp) / 1e9
        val runs = (1 to reps).map(_ => encodeRun(s, fixturePath, opts, plan))
        runs.minBy(_._1)
      } finally stop(s)
    }
    // JIT + page-cache warmup at every level (shared JVM => shared JIT;
    // C2 needs several full passes), discarded
    atCores(24, 2); atCores(8, 2); atCores(2, 1)
    // Paired-round design: each round measures BOTH levels back to back
    // (min of 2 reps each), so background-load windows on this shared box
    // hit the two levels of a round together and mostly cancel in the
    // round's efficiency ratio. The headline scaling efficiency is the
    // MEDIAN of the per-round ratios — robust to a noisy round in either
    // direction — alongside the min-of-all-reps throughputs per level.
    // rounds whose ratio falls outside [0.3, 1.3] hit a shared-box load
    // spike in ONE leg (round-2 saw a 2.565 sample) — discard and re-run
    // instead of trusting the median to absorb them
    var best2: (Double, Long, Long, Long, Map[String, Long]) = null
    var best8: (Double, Long, Long, Long, Map[String, Long]) = null
    val effSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    var localRound = 0
    while (effSamples.length < 5 && localRound < 8) {
      localRound += 1
      val r2 = atCores(2, 2)
      val r8 = atCores(8, 2)
      val eff = (r8._2 / r8._1) / (4.0 * (r2._2 / r2._1))
      // a box hammered for all 8 rounds still reports (ungated) rather
      // than crashing on an empty sample set
      if ((eff >= 0.3 && eff <= 1.3) || (effSamples.isEmpty && localRound == 8)) {
        effSamples += eff
        if (best2 == null || r2._1 < best2._1) best2 = r2
        if (best8 == null || r8._1 < best8._1) best8 = r8
      }
    }
    val (sec2, toks2, _, _, _) = best2
    val (sec8, toks8, _, _, _) = best8
    val (sec24, toks24, raw24, enc24, mix) = atCores(24, 6)

    // 2b) multi-JVM scaling evidence: local-cluster[N,1,mem] forks N
    // SEPARATE single-core executor JVMs (per-executor heaps, real shuffle
    // serialization + netty fetch) — the faithful in-sandbox proxy for two
    // real cluster sizes (north rule: N vs 4N executors = 2 vs 8 workers).
    // The job is size-multiplied so the fast leg's wall time sits well
    // above fixed per-job cost (scheduling, plan broadcast, stage setup);
    // paired rounds whose ratio falls outside [0.3, 1.3] are discarded and
    // re-run (shared-box load spike), and the MEDIAN of valid rounds is
    // the headline. Child JVMs are used because standalone workers fork
    // executors via $SPARK_HOME/bin/spark-class.
    val estTokens = nDocs * 680L // fixture is ~677 tokens/doc
    val clusterRepeat = math.max(1L, (400L * 1000 * 1000 + estTokens - 1) / estTokens)
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
      val pb = new ProcessBuilder(javaBin, "-Xmx4g", "-cp",
        System.getProperty("java.class.path"), "graft.BenchCluster",
        clusterFixture, workers.toString, "2")
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
    var clusterBest2 = Double.MaxValue
    var clusterBest8 = Double.MaxValue
    var clusterToks = 0L
    var round = 0
    while (haveSparkHome && clusterSamples.length < 3 && round < 5) {
      round += 1
      (clusterLeg(2), clusterLeg(8)) match {
        case (Some((s2, t2)), Some((s8, _))) =>
          val eff = (t2 / s8) / (4.0 * (t2 / s2))
          if (eff >= 0.3 && eff <= 1.3) { // else: load spike, re-run round
            clusterSamples += eff
            clusterBest2 = math.min(clusterBest2, s2)
            clusterBest8 = math.min(clusterBest8, s8)
            clusterToks = t2
          }
        case _ => () // child failed; retry within the round budget
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

    // decode throughput + partition-balance histogram (skew evidence) at 24
    var thrDec = 0.0
    var thrRec = 0.0
    var skewMaxOverAvg = 0.0
    locally {
      import org.apache.spark.sql.Encoders
      val s = session(24)
      try {
        val ds = s.read.parquet(fixturePath).as[TokenRow](Encoders.product[TokenRow])
        val plan = Planner.plan(ds, opts)
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

    // 3) per-query timings at the driver-configured parallelism
    val s = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(s, sfDir).count() catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, sec, n)
    }
    stop(s)

    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val mixJson = mix.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      f""""encode_mtok_s_local2":$thr2%.1f,"encode_mtok_s_local8":$thr8%.1f,""" +
      f""""encode_mtok_s_local24":$thr24%.1f,""" +
      f""""scaling_efficiency":$scalingEff%.3f,""" +
      s""""scaling_pair":"local[2]->local[8] (N->4N cores, below the single-box memory-bandwidth ceiling)",""" +
      s""""scaling_efficiency_samples":[${effSamples.map(e => f"$e%.3f").mkString(",")}],""" +
      f""""scaling_efficiency_minbased":$scalingEffMin%.3f,""" +
      f""""scaling_efficiency_8to24":$scalingEff8to24%.3f,""" +
      (if (!clusterEff.isNaN) {
        val thrC2 = clusterToks / clusterBest2 / 1e6
        val thrC8 = clusterToks / clusterBest8 / 1e6
        f""""scaling_efficiency_local_cluster":$clusterEff%.3f,""" +
        s""""scaling_cluster_pair":"local-cluster[2,1,3g] -> local-cluster[8,1,3g] (N->4N separate single-core executor JVMs, real shuffle ser/deser)",""" +
        s""""scaling_cluster_samples":[${clusterSamples.map(e => f"$e%.3f").mkString(",")}],""" +
        f""""encode_mtok_s_cluster2":$thrC2%.1f,"encode_mtok_s_cluster8":$thrC8%.1f,""" +
        s""""cluster_job_tokens":$clusterToks,"""
      } else "") +
      f""""compression_ratio":$ratio%.3f,""" +
      f""""decode_mtok_s_local24":$thrDec%.1f,""" +
      f""""recompress_mtok_s_local24":$thrRec%.1f,""" +
      f""""part_tokens_max_over_avg":$skewMaxOverAvg%.2f,""" +
      f""""plan_sec":$planSec%.2f,""" +
      s""""bench_tokens":$toks24,"raw_bytes":$raw24,"encoded_bytes":$enc24,""" +
      s""""codec_mix":$mixJson}"""
    // the contract line (fork + StdoutOutput => no sbt prefix) plus a file
    // copy so the driver can parse either way
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), json + "\n")
  }
}
