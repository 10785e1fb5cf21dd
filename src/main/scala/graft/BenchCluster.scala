package graft

import org.apache.spark.sql.{SparkSession, functions => F}

/** One leg of the multi-JVM scaling experiment (round-2 verdict item 2):
  * runs the encode benchmark under `local-cluster[workers, 1, mem]` —
  * Spark standalone's test cluster with SEPARATE single-core executor
  * JVMs, real shuffle serialization and netty transfers, per-executor
  * memory — and prints one marker line the parent [[Bench]] parses.
  * Launched as a child JVM (with SPARK_HOME set) because executor
  * processes are forked via `$SPARK_HOME/bin/spark-class`.
  *
  * args: fixtureParquetPath numWorkers maxReps
  */
object BenchCluster {
  def main(args: Array[String]): Unit = {
    val fixturePath = args(0)
    val workers = args(1).toInt
    val maxReps = args(2).toInt
    val memMb = 3072
    val s = SparkSession.builder()
      .master(s"local-cluster[$workers,1,$memMb]")
      .appName(s"graft-bench-cluster-$workers")
      .config("spark.sql.shuffle.partitions", math.max(workers, 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.executor.memory", s"${memMb - 512}m")
      // ship the graft classes to the executor JVMs
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      // the scaling experiment's serial fraction is driver scheduling, not
      // compute: big scan splits (fewer tasks) and no locality stalls keep
      // the driver out of the critical path so the cores measure the engine
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (4 * 1024 * 1024).toString)
      .config("spark.locality.wait", "0")
      // AQE ON (Spark default), measured deliberately: an interleaved A/B
      // at 8 workers had AQE-on ~7% faster in both rounds (min-of-4 6.42
      // vs 6.88, 5.33 vs 5.74 s) — its partition coalescing merges the 64
      // ~25 MB routed shuffle partitions into fewer right-sized tasks,
      // which outweighs the re-plan pause; leg2 was neutral (20.2 vs
      // 19.3 s under heavier load). Knob kept for future A/Bs.
      .config("spark.sql.adaptive.enabled", sys.props.getOrElse("graft.aqe", "true"))
      .getOrCreate()
    s.sparkContext.setLogLevel(sys.props.getOrElse("graft.loglevel", "ERROR"))
    try {
      import org.apache.spark.sql.Encoders
      // 64 planned parts ~= 6-8M tokens (25-30 MB) per encode task at the
      // parent-chosen >=400M-token job: few scheduling waves, real per-task
      // work — the shape a 1000-executor run would use per core
      val nParts = if (args.length > 3) args(3).toInt else 64
      val pack = args.length > 4 && args(4) == "pack"
      val opts = EncodeOptions(numParts = nParts, sampleMod = 16,
        packShuffle = pack)
      val ds = s.read.parquet(fixturePath).as[TokenRow](Encoders.product[TokenRow])
      val plan = Planner.plan(ds, opts)
      val comp = TokenCompressor(opts)
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val agg = comp.encodeWithPlan(ds, plan, None).toDF()
          .agg(F.sum("n_tokens").as("toks")).head()
        ((System.nanoTime() - t0) / 1e9, agg.getAs[Long]("toks"))
      }
      // JIT + page-cache warmup in THIS cluster's executor JVMs — at the
      // parent-chosen job size (>= 400M tokens) one full pass pushes the
      // encode kernel far past C2 thresholds on every executor. The rep
      // budget clock starts BEFORE the warmup: on a crushed box a single
      // pass can take many minutes, and a budget that ignored it could
      // still run the child into the parent's hard kill-timeout
      val budget0 = System.nanoTime()
      val warm = once()
      // convergence-based reps (same policy as the parent's local legs):
      // rep until the two fastest agree within 5% (>= 3, <= maxReps).
      // Noise is one-sided — extra reps land on the leg a load window hit,
      // correcting its floor estimate instead of skewing the round ratio.
      // WALL-CLOCK BUDGET on top: under heavy co-tenant load a ~30 s rep
      // can stretch to minutes; without a budget the convergence loop ran
      // a leg into the parent's hard kill-timeout, which discarded the
      // whole round (measured: a leg2 killed at 20 min with its data
      // unread). Past the budget the leg returns its best-so-far (down to
      // a single rep when even the warmup blew the budget) — a weaker
      // floor estimate, visible in the REPS line, beats a vanished round.
      val repBudgetSec = sys.props.getOrElse("graft.repBudgetSec", "360").toInt
      // tight budgets accept 2-rep convergence: one warm + two measured
      // passes is a weaker floor than three, but ~25% shorter legs dodge
      // this box's minutes-long co-tenant storms far more often — the
      // difference between 0 and 3 landed samples in a 720 s driver run
      val minReps = if (repBudgetSec < 200) 2 else 3
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      // if the WARMUP alone blew the budget (badly loaded box), don't run
      // even one measured rep — reuse the warmup sample as the single rep
      // so the child still emits a result before the parent's hard kill
      // (a JIT-cold floor estimate beats a vanished round)
      if ((System.nanoTime() - budget0) / 1e9 > repBudgetSec) runs += warm
      var go = runs.isEmpty
      while (go) {
        runs += once()
        val sorted = runs.map(_._1).sorted
        val spent = (System.nanoTime() - budget0) / 1e9
        go = (runs.length < minReps ||
          (runs.length < maxReps && sorted(1) / sorted(0) > 1.05)) &&
          spent <= repBudgetSec
      }
      val best = runs.minBy(_._1)
      // per-rep times on a separate diagnostic line (parent parses only the
      // GRAFT_CLUSTER_RESULT marker): JIT-vs-steady-state visibility
      println(String.format(java.util.Locale.ROOT,
        "GRAFT_CLUSTER_REPS warm=%.3f reps=%s",
        java.lang.Double.valueOf(warm._1),
        runs.map(r => String.format(java.util.Locale.ROOT, "%.3f",
          java.lang.Double.valueOf(r._1))).mkString(",")))
      // Locale.ROOT: the parent parses a dot-decimal regex; a comma-decimal
      // default locale would silently truncate the captured seconds
      val sec = String.format(java.util.Locale.ROOT, "%.3f",
        java.lang.Double.valueOf(best._1))
      println(s"""GRAFT_CLUSTER_RESULT {"workers":$workers,"sec":$sec,"tokens":${best._2}}""")
    } finally s.stop()
  }
}
