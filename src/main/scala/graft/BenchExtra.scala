package graft

import org.apache.spark.sql.{Encoders, SparkSession, functions => F}

/** Extra (non-contract) benchmarks for the round-9 optimization work:
  * stage-level breakdown of the oracle queries' encode path and noop-sink
  * isolation (guide §1.4) so per-operator costs are measured without the
  * count() sink or the session warmup noise. NOT part of the driver
  * contract — Bench.scala is the frozen harness; numbers from here are
  * cited in OPTIMIZATION_r09.md only.
  *
  * usage: runMain graft.BenchExtra <sfDir> <cores> <mode>
  *   modes: breakdown | noop <query...>
  */
object BenchExtra {
  private def session(cores: Int): SparkSession = {
    val shuffleDir =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_extra_shuffle"
      else s"${sys.props("java.io.tmpdir")}/graft_extra_shuffle"
    new java.io.File(shuffleDir).mkdirs()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-extra-$cores")
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

  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"EXTRA $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1).toInt
    val mode = if (args.length > 2) args(2) else "breakdown"
    val s = session(cores)
    s.sparkContext.setJobDescription("bench-extra")
    try {
      mode match {
        case "breakdown" => (1 to 3).foreach(_ => breakdown(s, sfDir))
        case "noop" =>
          val names = args.drop(3).toSeq
          names.foreach { name =>
            val fn = SparkEntry.queries(name)
            (1 to 3).foreach { i =>
              timed(s"noop:$name#$i") {
                fn(s, sfDir).write.format("noop").mode("overwrite").save()
              }
            }
          }
      }
    } finally s.stop()
  }

  private def breakdown(s: SparkSession, sfDir: String): Unit = {
    val input = TokenTables.fromLineitem(s, sfDir)
    val opts = EncodeOptions(numParts = 8)
    val n = timed("count")(input.count())
    val mod = Planner.autoSampleMod(n)
    println(s"EXTRA rows=$n autoSampleMod=$mod")
    val sampled = timed("plan:sample-collect") {
      (if (mod <= 1) input.select(F.col("doc_id"), F.col("n_tok"))
       else input.select(F.col("doc_id"), F.col("n_tok"))
         .where(F.pmod(F.xxhash64(F.col("doc_id")), F.lit(mod)) === 0))
        .collect()
        .map(r => (r.getString(0), r.getInt(1).toLong))
    }
    val sorted = timed("plan:driver-sort")(sampled.sortBy(_._1)(DocIdOrder))
    val plan = timed("plan:fromSample")(Planner.fromSample(sorted, opts.numParts))
    val comp = TokenCompressor(opts)
    timed("encode+agg(noop-ish)") {
      comp.encodeWithPlan(input, plan, None).toDF()
        .write.format("noop").mode("overwrite").save()
    }
    timed("encode+decode+digest.count") {
      TokenTables.digest(comp.decode(comp.encodeWithPlan(input, plan, None))).count()
    }
  }
}
