package graft

import org.apache.spark.sql.{Encoders, SparkSession, functions => F}

/** Stage-differential profiling harness for the peak encode/decode legs —
  * NOT part of the judged bench. Runs the same encodeRun-shaped job as
  * Bench's peak_local24 section under ablated options so the wall cost of
  * each pipeline stage (zstd frame, codec kernels, checksum, shuffle) can
  * be read as a difference of medians, and doubles as the launch target
  * for JFR sampling runs (`-XX:StartFlightRecording`).
  *
  * Usage: runMain graft.BenchProfile <cores> <reps> <variant...>
  *   variants: full | nozstd | plainz0 | plain | nopack | decode |
  *             decodenv | recompress
  */
object BenchProfile {
  private def session(cores: Int): SparkSession = {
    val shuffleDir =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_bench_shuffle"
      else s"${sys.props("java.io.tmpdir")}/graft_bench_shuffle"
    new java.io.File(shuffleDir).mkdirs()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-profile-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", shuffleDir)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1 * 1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(24)
    val reps = if (args.length > 1) args(1).toInt else 3
    val variants = if (args.length > 2) args.drop(2).toSeq else Seq("full")
    val fixture = sys.env.getOrElse("GRAFT_FIXTURE", "/tmp/graft_bench_fixture_128000")
    val s = session(cores)
    val ds = s.read.parquet(fixture).as[TokenRow](Encoders.product[TokenRow])
    val base = EncodeOptions(numParts = 128, sampleMod = 16)
    val plan = Planner.plan(ds, base)

    def encodeLeg(opts: EncodeOptions): (Double, Long) = {
      val comp = TokenCompressor(opts)
      val t0 = System.nanoTime()
      val agg = comp.encodeWithPlan(ds, plan, None).toDF()
        .agg(F.sum("n_tokens").as("toks"), F.sum("encoded_bytes").as("enc")).head()
      ((System.nanoTime() - t0) / 1e9, agg.getLong(0))
    }

    lazy val blocksPath = {
      val p = s"$fixture.profile_blocks"
      if (!new java.io.File(p, "_SUCCESS").exists())
        TokenCompressor(base).encodeWithPlan(ds, plan, None).toDF()
          .write.mode("overwrite").parquet(p)
      p
    }
    val cols = Encoders.product[EncodedBlock].schema.fieldNames.map(F.col)
    def blocks() = s.read.parquet(blocksPath)
      .select(cols.toIndexedSeq: _*).as[EncodedBlock](Encoders.product[EncodedBlock])

    def leg(v: String): (Double, Long) = v match {
      case "full"    => encodeLeg(base)
      case "nozstd"  => encodeLeg(base.copy(zstdLevel = 0))
      case "plainz0" => encodeLeg(base.copy(codecPolicy = "plain", zstdLevel = 0))
      case "plain"   => encodeLeg(base.copy(codecPolicy = "plain"))
      case "nopack"  => encodeLeg(base.copy(packShuffle = false))
      case "decode" =>
        val comp = TokenCompressor(base)
        val t0 = System.nanoTime()
        val n = comp.decode(blocks()).toDF().agg(F.sum("n_tok")).head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, n)
      case "decodenv" =>
        val comp = TokenCompressor(base)
        val t0 = System.nanoTime()
        val n = comp.decode(blocks(), verify = false).toDF()
          .agg(F.sum("n_tok")).head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, n)
      case "recompress" =>
        val comp = TokenCompressor(base)
        val t0 = System.nanoTime()
        val n = comp.recompress(blocks(), verify = false).toDF()
          .agg(F.sum("n_tokens")).head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, n)
      case other => sys.error(s"unknown variant $other")
    }

    // one warm rep per variant, then interleaved timed reps
    variants.foreach { v => val (sec, n) = leg(v); println(f"warm  $v%-10s ${sec}%6.2f s  ${n / sec / 1e6}%7.1f MTok/s") }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (r <- 1 to reps; v <- variants) {
      val (sec, n) = leg(v)
      val thr = n / sec / 1e6
      acc(v) = acc(v) :+ thr
      println(f"rep$r  $v%-10s ${sec}%6.2f s  $thr%7.1f MTok/s")
    }
    println("== medians ==")
    variants.foreach { v =>
      val xs = acc(v).sorted
      if (xs.nonEmpty) println(f"$v%-10s ${xs(xs.length / 2)}%7.1f MTok/s (best ${xs.last}%7.1f)")
    }
    s.stop()
  }
}
