package graft

import org.apache.spark.sql.{Encoders, SparkSession, functions => F}

/** Scratch experiment harness for performance iteration (not part of the
  * driver contract). args: nDocs cores parts [repeats]
  */
object Exp {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toLong
    val cores = args(1).toInt
    val parts = args(2).toInt
    val reps = if (args.length > 3) args(3).toInt else 2
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val path = s"${sys.props("java.io.tmpdir")}/graft_bench_fixture_$nDocs"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      Fixtures.tokenTable(s, nDocs, partitions = 256)
        .write.mode("overwrite").parquet(path)
    }
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[exp] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val ds = s.read.parquet(path).as[TokenRow](Encoders.product[TokenRow])
    val policy = sys.env.getOrElse("EXP_POLICY", "auto")
    val zl = sys.env.getOrElse("EXP_ZSTD", "3").toInt
    val opts = EncodeOptions(codecPolicy = policy, zstdLevel = zl,
      numParts = parts, sampleMod = 64)
    val comp = TokenCompressor(opts)
    for (r <- 1 to reps) {
      val plan = time(s"rep$r plan")(Planner.plan(ds, opts))
      val blocks = comp.encodeWithPlan(ds, plan, None)
      val agg = time(s"rep$r encode")(
        blocks.toDF().agg(F.sum("n_tokens"), F.sum("raw_bytes"), F.sum("encoded_bytes")).collect())
      val toks = agg(0).getLong(0)
      println(f"[exp] rep$r throughput: ${toks / 1e6}%.1f Mtok")
      // scan-only baseline: how fast can we even read+deserialize?
      time(s"rep$r scanonly")(
        ds.mapPartitions(it => Iterator.single(it.map(_.tokens.length.toLong).sum))(Encoders.scalaLong)
          .reduce(_ + _))
      // shuffle+sort-only: the routing exchange without block encoding
      time(s"rep$r shuffleonly") {
        import org.apache.spark.sql.functions.{col, udf}
        val planB = s.sparkContext.broadcast(plan)
        val pu = udf((id: String) => planB.value.partIdOf(id))
        ds.toDF().withColumn("part_id", pu(col("doc_id")))
          .repartition(plan.numParts, col("part_id"))
          .sortWithinPartitions(col("part_id"), col("doc_id"))
          .select(F.sum(F.size(col("tokens")))).collect()
      }
    }
    s.stop()
  }
}
