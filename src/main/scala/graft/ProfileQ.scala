package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-query profiler: times named SparkEntry queries (3 reps each,
  * min reported) at local[N] on a given sf dir. Not part of the driver
  * contract — exists so perf work measures the query it is changing
  * without paying a full Bench run.
  *
  * args: sfDir cores query1 [query2 ...]   ("all" = every query)
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1).toInt
    val names =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_prof_shuffle"
        else s"${sys.props("java.io.tmpdir")}/graft_prof_shuffle")
      // mirror Bench.session exactly so profiled plans and timings match
      // what the driver's bench measures
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1 * 1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try {
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val secs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val n = fn(s, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          (sec, n)
        }
        val best = secs.map(_._1).min
        println(f"PROFQ $name%-22s best=$best%7.3f s  reps=${secs.map(x => f"${x._1}%.3f").mkString(",")}  rows=${secs.head._2}")
      }
    } finally s.stop()
  }
}
