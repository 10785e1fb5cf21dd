package graft

import org.apache.spark.sql.{Encoders, SparkSession, functions => F}

/** Scaling sweep in ONE JVM (shared JIT): encode reps at each core count.
  * args: nDocs reps cores...
  */
object Exp2 {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toLong
    val reps = args(1).toInt
    val coreList = args.drop(2).map(_.toInt)
    val path = s"${sys.props("java.io.tmpdir")}/graft_bench_fixture_$nDocs"

    def session(cores: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
        .config("spark.shuffle.compress", sys.env.getOrElse("EXP_SHUF_COMPRESS", "true"))
        .config("spark.shuffle.spill.compress", sys.env.getOrElse("EXP_SHUF_COMPRESS", "true"))
        .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    locally {
      val s = session(coreList.max)
      if (!new java.io.File(path, "_SUCCESS").exists())
        Fixtures.tokenTable(s, nDocs, partitions = 256)
          .write.mode("overwrite").parquet(path)
      s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
    val results = coreList.map { cores =>
      val s = session(cores)
      val ds = s.read.parquet(path).as[TokenRow](Encoders.product[TokenRow])
      val opts = EncodeOptions(numParts = 128, sampleMod = 64)
      val plan = Planner.plan(ds, opts)
      val comp = TokenCompressor(opts)
      val times = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        val toks = comp.encodeWithPlan(ds, plan, None).toDF()
          .agg(F.sum("n_tokens")).collect()(0).getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[exp2] cores=$cores rep=$r sec=$sec%.2f thr=${toks / sec / 1e6}%.1f")
        sec
      }
      s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      cores -> times.min
    }
    results.foreach { case (c, t) => println(f"[exp2] BEST cores=$c sec=$t%.2f") }
  }
}
