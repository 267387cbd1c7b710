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
/** Timing helpers shared by [[Bench]] and [[BenchAB]] — one definition so
  * the two harnesses can never disagree on the same run vector. */
private[graft] object BenchUtil {
  def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Conventional median: even-length vectors average the two middle
    * values (an odd rounds count, the default 3, is unaffected). */
  def median(v: Seq[Double]): Double = {
    val s = v.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }
}

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

    import BenchUtil.{time, median}

    // >=3 repeat ROUNDS interleaved across queries (not back-to-back per
    // query): the sandbox VM freezes for tens of seconds at a time, and a
    // stall that lands inside one query's back-to-back repeats poisons
    // every number in that alphabetical block (seen in BENCH_r02).
    // Interleaving makes a stall hit one round of many queries instead,
    // and the per-query MEDIAN over rounds shakes it off entirely.
    val rounds = math.max(3, sys.env.getOrElse("BENCH_ROUNDS",
      sys.env.getOrElse("BENCH_REPEAT", "3")).toInt)

    // headline: extraction docs/sec (north-rule metric). Measured on a
    // fixed 40k-doc corpus regardless of sf so the number amortizes task
    // launch and is comparable to BASELINE.md's scaling table. The VM
    // has multi-second external stalls (5x run variance documented in
    // BASELINE.md), so the headline uses >=3 timed repeats after 2
    // warmups and reports best AND median — best is the number of
    // record (matches graft.Scaling's best-of-N protocol), the median
    // shows how noisy this particular run was.
    val nDocs = 40000L
    val extractRepeat = rounds // already clamped to >= 3
    val docs = graft.io.SyntheticCorpus.docs(spark, nDocs, partitions = 256)
    graft.pipeline.Extract.run(docs).count() // warmup (codegen/JIT)
    graft.pipeline.Extract.run(docs).count()
    val runs = (1 to extractRepeat).map(_ => time(graft.pipeline.Extract.run(docs).count()))
      .sorted
    val extractSec = runs.head
    val extractMedian = median(runs)
    val docsPerSec = nDocs / extractSec

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val times = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    val failed = scala.collection.mutable.Set[String]()
    (1 to rounds).foreach { _ =>
      names.foreach { case (name, fn) =>
        if (!failed(name)) {
          try {
            val sec = time(fn(spark, sfDir).count())
            times(name) = times.getOrElse(name, Vector.empty) :+ sec
          } catch { case _: Throwable => failed += name; times.remove(name) }
        }
      }
    }
    val med = names.map { case (k, _) =>
      k -> times.get(k).map(median).getOrElse(-1.0) }
    val best = names.map { case (k, _) =>
      k -> times.get(k).map(_.min).getOrElse(-1.0) }
    def js(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = med.map(_._2).filter(_ >= 0).sum
    val totalBest = best.map(_._2).filter(_ >= 0).sum
    // stall detection: per-round totals over fully-measured queries — a
    // VM freeze shows up as one round grossly slower than another. Round
    // 1 is excluded from the ratio (it carries JIT/codegen warmup, ~1.6x
    // at sf0.01); it is still recorded in round_totals.
    val complete = times.values.filter(_.length == rounds).toVector
    val roundTotals = (0 until rounds).map(r => complete.map(_(r)).sum)
    val steady = roundTotals.drop(1)
    val stallRatio =
      if (steady.nonEmpty && steady.min > 0) steady.max / steady.min
      else -1.0
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(med)},""" +
        s""""queries_best":${js(best)},"total_best":$totalBest,"rounds":$rounds,""" +
        s""""round_totals":[${roundTotals.mkString(",")}],""" +
        s""""stall_ratio":$stallRatio,"stall_detected":${stallRatio > 2.0},""" +
        s""""sf":"$sfDir",""" +
        s""""extract_docs":$nDocs,"extract_sec":$extractSec,"extract_docs_per_sec":$docsPerSec,""" +
        s""""extract_sec_median":$extractMedian,"extract_repeats":$extractRepeat,""" +
        s""""cpus":$cpus}""")
    spark.stop()
  }
}
