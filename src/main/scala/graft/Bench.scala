package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every SparkEntry query once (count) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Also reports extraction throughput (docs/sec on the synthetic
  * interleaved corpus) — the BASELINE.json headline metric. Scaling
  * evidence (local[8] vs local[32]) is produced by running this main at
  * two SPARK_GRAFT_CPUS values; see BASELINE.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // best-of-N to damp the sandbox VM's timing noise
    val repeat = sys.env.getOrElse("BENCH_REPEAT", "2").toInt
    def best(f: => Unit): Double = (1 to repeat).map(_ => time(f)).min

    // headline: extraction docs/sec (north-rule metric). Measured on a
    // fixed 40k-doc corpus regardless of sf so the number amortizes task
    // launch and is comparable to BASELINE.md's scaling table. The VM
    // has multi-second external stalls (5x run variance documented in
    // BASELINE.md), so the headline uses >=3 timed repeats after 2
    // warmups and reports best AND median — best is the number of
    // record (matches graft.Scaling's best-of-N protocol), the median
    // shows how noisy this particular run was.
    val nDocs = 40000L
    val extractRepeat = math.max(3, repeat)
    val docs = graft.io.SyntheticCorpus.docs(spark, nDocs, partitions = 256)
    graft.pipeline.Extract.run(docs).count() // warmup (codegen/JIT)
    graft.pipeline.Extract.run(docs).count()
    val runs = (1 to extractRepeat).map(_ => time(graft.pipeline.Extract.run(docs).count()))
      .sorted
    val extractSec = runs.head
    val extractMedian = runs(runs.length / 2)
    val docsPerSec = nDocs / extractSec

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try {
        best(fn(spark, sfDir).count())
      } catch { case _: Throwable => -1.0 }
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""extract_docs":$nDocs,"extract_sec":$extractSec,"extract_docs_per_sec":$docsPerSec,""" +
        s""""extract_sec_median":$extractMedian,"extract_repeats":$extractRepeat,""" +
        s""""cpus":$cpus}""")
    spark.stop()
  }
}
