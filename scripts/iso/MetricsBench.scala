import org.apache.spark.sql.SparkSession
object MetricsBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpusDir = "/tmp/mm_corpus"
    val cfg = graft.io.TableIO.Cfg(nBuckets = 128)
    if (!new java.io.File(corpusDir + "/_SUCCESS").exists())
      graft.io.TableIO.writeDocs(graft.io.SyntheticCorpus.docs(spark, 100000L, partitions = 256), corpusDir, cfg)
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val obs = (graft.pipeline.Checkpoint.MetricsObserve, "observe")
    val rb = (graft.pipeline.Checkpoint.MetricsReadBack, "readback")
    var n = 0
    val out = new java.io.PrintWriter("/tmp/mm_results.txt")
    // round 0 is JIT warmup (reported but tagged); order alternates per round
    for (round <- 0 to 2; (mode, tag) <- if (round % 2 == 0) Seq(obs, rb) else Seq(rb, obs)) {
      n += 1
      val dir = s"/tmp/mm2_out_$n"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val t = time {
        val ms = graft.pipeline.Checkpoint.runPartitioned(spark, corpusDir, dir, cfg,
          parallelism = 4, metricsMode = mode)
        require(ms.map(_.nDocs).sum == 100000L)
      }
      out.println(f"""{"round":$round,"mode":"$tag","sec":$t%.1f}"""); out.flush()
    }
    out.close()
    spark.stop()
  }
}
