package graft

import org.apache.spark.sql.SparkSession

/** Writes the deterministic bench fixture to a path (A/B bisect helper).
  * args: outPath nDocs
  */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val nDocs = args(1).toLong
    val s = SparkSession.builder().master("local[32]")
      .appName("graft-fixture-gen")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try Fixtures.tokenTable(s, nDocs, partitions = 64)
      .write.mode("overwrite").parquet(out)
    finally s.stop()
  }
}
