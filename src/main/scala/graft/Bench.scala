package graft

import org.apache.spark.sql.{SparkSession, functions => F}

/** Benchmark driver (driver contract: prints ONE JSON line).
  *
  * Measures the BASELINE.md metrics:
  *  - encode throughput (M tokens/s) on the deterministic fixture table at
  *    two parallelism levels, local[8] vs local[32] — the sandbox stand-in
  *    for N vs 4N executors (BASELINE.json north_rule) — plus scaling
  *    efficiency = thr(32) / (4 x thr(8));
  *  - compression ratio raw/encoded and the codec mix;
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
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def stop(s: SparkSession): Unit = {
    s.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  /** Encode the fixture parquet end-to-end (scan -> plan -> route -> encode
    * -> metrics agg); returns (seconds, tokens, rawBytes, encodedBytes,
    * codecMix).
    */
  private def encodeRun(s: SparkSession, inputPath: String, parts: Int)
      : (Double, Long, Long, Long, Map[String, Long]) = {
    import org.apache.spark.sql.Encoders
    val ds = s.read.parquet(inputPath).as[TokenRow](Encoders.product[TokenRow])
    val comp = TokenCompressor(EncodeOptions(numParts = parts))
    val t0 = System.nanoTime()
    val agg = comp.encode(ds).toDF().groupBy("codec").agg(
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
      if (sfDir.contains("sf0.1")) 120000L
      else if (sfDir.contains("sf0.01")) 12000L
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

    // 2) scaling experiment: identical job at 8 and 32 cores
    def atCores(cores: Int): (Double, Long, Long, Long, Map[String, Long]) = {
      val s = session(cores)
      try {
        encodeRun(s, fixturePath, parts = 64) // warm JIT + page cache
        val runs = (1 to 2).map(_ => encodeRun(s, fixturePath, parts = 64))
        runs.minBy(_._1)
      } finally stop(s)
    }
    val (sec8, toks8, _, _, _) = atCores(8)
    val (sec32, toks32, raw32, enc32, mix) = atCores(32)
    val thr8 = toks8 / sec8 / 1e6
    val thr32 = toks32 / sec32 / 1e6
    val scalingEff = thr32 / (4.0 * thr8)
    val ratio = raw32.toDouble / enc32

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
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      f""""encode_mtok_s_local8":$thr8%.1f,"encode_mtok_s_local32":$thr32%.1f,""" +
      f""""scaling_efficiency":$scalingEff%.3f,"compression_ratio":$ratio%.3f,""" +
      s""""bench_tokens":$toks32,"raw_bytes":$raw32,"encoded_bytes":$enc32,""" +
      s""""codec_mix":$mixJson}""")
  }
}
