package graft

import org.apache.spark.sql.{SparkSession, functions => F}

/** Minimal A/B harness for the r2->r3 throughput-regression bisect
  * (VERDICT round 3, "Next round" item 2). Measures ONLY the encode and
  * decode kernels at local[24] on a pre-materialized fixture; prints one
  * JSON line per invocation. Run interleaved (r2 build, HEAD build, r2,
  * HEAD, ...) on an idle box so environment drift hits both sides.
  *
  * args: fixtureParquetPath label [pack]
  * The optional third arg `pack` turns on EncodeOptions.packShuffle, for
  * the codegen-pack A/B (r6 verdict item 6: the knob must no longer lose
  * locally now that pack/unpack are native expressions).
  */
object BenchAB {
  def main(args: Array[String]): Unit = {
    val fixturePath = args(0)
    val label = args(1)
    val pack = args.length > 2 && args(2) == "pack"
    val s = SparkSession.builder()
      .master("local[24]")
      .appName(s"graft-ab-$label")
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // tmpfs shuffle, same reason as Bench.shuffleDir: the sandbox root
      // disk throttles under sustained writeback, which contaminates
      // exactly the rep-to-rep comparisons this harness exists for
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_ab_shuffle"
        else s"${sys.props("java.io.tmpdir")}/graft_ab_shuffle")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1 * 1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try {
      import org.apache.spark.sql.Encoders
      val opts = EncodeOptions(numParts = 128, sampleMod = 16,
        packShuffle = pack)
      val ds = s.read.parquet(fixturePath).as[TokenRow](Encoders.product[TokenRow])
      val plan = Planner.plan(ds, opts)
      val comp = TokenCompressor(opts)
      def encOnce(): (Double, Long) = {
        val t0 = System.nanoTime()
        val toks = comp.encodeWithPlan(ds, plan, None).toDF()
          .agg(F.sum("n_tokens")).head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, toks)
      }
      encOnce(); encOnce() // C2 warmup
      val encRuns = (1 to 5).map(_ => encOnce())
      val toks = encRuns.head._2
      val encSecs = encRuns.map(_._1)
      // decode: write blocks once, then time decode passes
      val blocksPath = s"$fixturePath.ab_blocks_$label"
      comp.encodeWithPlan(ds, plan, None).toDF()
        .write.mode("overwrite").parquet(blocksPath)
      val cols = Encoders.product[EncodedBlock].schema.fieldNames.map(F.col)
      def decOnce(): Double = {
        val blocks = s.read.parquet(blocksPath)
          .select(cols.toIndexedSeq: _*).as[EncodedBlock](Encoders.product[EncodedBlock])
        val t0 = System.nanoTime()
        val n = comp.decode(blocks).toDF().agg(F.sum("n_tok")).head().getLong(0)
        n / ((System.nanoTime() - t0) / 1e9) / 1e6
      }
      decOnce() // warm
      val decThrs = (1 to 4).map(_ => decOnce())
      val encMin = encSecs.min
      val json =
        s"""{"ab":"$label","tokens":$toks,""" +
        s""""enc_secs":[${encSecs.map(x => f"$x%.3f").mkString(",")}],""" +
        f""""enc_mtok_s_best":${toks / encMin / 1e6}%.1f,""" +
        s""""dec_mtok_s":[${decThrs.map(x => f"$x%.1f").mkString(",")}],""" +
        f""""dec_mtok_s_best":${decThrs.max}%.1f}"""
      println("GRAFT_AB " + json)
    } finally s.stop()
  }
}
