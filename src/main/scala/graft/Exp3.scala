package graft

import org.apache.spark.sql.{Encoders, SparkSession, functions => F}

/** Per-codec CPU accounting from block-level enc_micros (scheduling-noise
  * immune). args: nDocs cores
  */
object Exp3 {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toLong
    val cores = args(1).toInt
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val path = s"${sys.props("java.io.tmpdir")}/graft_bench_fixture_$nDocs"
    if (!new java.io.File(path, "_SUCCESS").exists())
      Fixtures.tokenTable(s, nDocs, partitions = 256).write.mode("overwrite").parquet(path)
    val ds = s.read.parquet(path).as[TokenRow](Encoders.product[TokenRow])
    val opts = EncodeOptions(numParts = 128, sampleMod = 64, blockTokens = sys.env.getOrElse("EXP_BLOCK", (1 << 17).toString).toInt)
    val plan = Planner.plan(ds, opts)
    for (_ <- 1 to 2) {
      TokenCompressor(opts).encodeWithPlan(ds, plan, None).toDF()
        .groupBy("codec").agg(
          F.count(F.lit(1)).as("blocks"),
          F.sum("n_tokens").as("toks"),
          F.sum("enc_micros").as("micros"),
          F.sum("encoded_bytes").as("enc"),
          F.sum("raw_bytes").as("raw"))
        .orderBy(F.desc("micros"))
        .collect().foreach { r =>
          println(f"[exp3] ${r.getAs[String]("codec")}%8s blocks=${r.getAs[Long]("blocks")}%4d " +
            f"toks=${r.getAs[Long]("toks") / 1e6}%6.1fM cpu=${r.getAs[Long]("micros") / 1e6}%6.2fs " +
            f"MB=${r.getAs[Long]("enc") / 1e6}%6.1f ratio=${r.getAs[Long]("raw").toDouble / r.getAs[Long]("enc")}%5.2f")
        }
      println("[exp3] ---")
    }
    s.stop()
  }
}
