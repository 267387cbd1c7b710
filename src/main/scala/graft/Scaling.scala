package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (north rule: throughput scaling
  * efficiency >= 0.8 between N and 4N executors). The sandbox has no real
  * cluster, so the same job runs at several parallelism levels on the
  * SAME deterministic input, INTERLEAVED in one JVM (the sandbox host has
  * multi-second external stalls; interleaving + best-of-N makes the
  * comparison fair), and BASELINE.md records throughputs + efficiency
  * (thr_4N / thr_N) / 4 for the 4->16 and 8->32 core pairs.
  *
  * Usage: runMain graft.Scaling [nDocs] [passes] [parquet|pin|parquet-pin]
  * Fixed 256 input partitions across runs = identical task layout, only
  * executor-slot count varies (like N vs 4N executors). Over-partitioning
  * (8x the larger core count) keeps the heavy-tail docs (150-400 pages,
  * ~2% of corpus) from straggling a slot — the same partition-count story
  * that holds on a 1000-executor cluster.
  *
  * `pin` mode additionally sets the JVM's CPU affinity to `cores` CPUs
  * for each level (taskset -apc): plain local[N] on a 32-CPU host lets
  * the N-slot run's GC/codegen/shuffle threads spill onto the 28 idle
  * cores — a free boost a real N-core executor host does not get, which
  * deflates the measured N -> 4N ratio. Pinning makes each level a true
  * N-core host simulation (GC contends inside the budget, as it would on
  * a 4-core executor).
  */
object Scaling {

  /** Pin ALL current JVM threads (and, by inheritance, future ones) to
    * the given CPU list. The whole point of `pin` mode is methodology
    * validity, so a failed pin FAILS the run rather than silently
    * measuring unpinned behavior under a "pin" label. */
  private def pinCpus(cpuList: String): Unit = {
    val pid = ProcessHandle.current().pid()
    val rc =
      try {
        val p = new ProcessBuilder("taskset", "-apc", cpuList, pid.toString)
          .redirectOutput(ProcessBuilder.Redirect.DISCARD)
          .redirectErrorStream(true).start()
        p.waitFor()
      } catch { case e: java.io.IOException => System.err.println(s"taskset: $e"); -1 }
    if (rc != 0) {
      System.err.println(s"FATAL: taskset -apc $cpuList failed (rc=$rc) — " +
        "refusing to record an unpinned run as mode=pin")
      sys.exit(1)
    }
  }

  /** The JVM's CURRENT affinity list (captured before the first pin so
    * the original mask — possibly non-contiguous — can be restored;
    * availableProcessors() after pinning reflects the pinned mask, not
    * the original). */
  private def currentAffinity(): String = {
    val pid = ProcessHandle.current().pid()
    val p = new ProcessBuilder("taskset", "-pc", pid.toString).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    p.waitFor()
    // "pid 123's current affinity list: 0-31" -> "0-31"
    out.trim.split(":\\s*").last
  }

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      // small maxPartitionBytes so a compact parquet corpus still yields
      // enough scan splits to saturate every core (no repartition shuffle)
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 20000L
    val passes = if (args.length > 1) args(1).toInt else 4
    // "parquet" mode: materialize the corpus once and time SCAN+EXTRACT —
    // the production shape (read Iceberg/parquet, not generate); default
    // times GENERATE+EXTRACT (no IO, pure compute scaling).
    val mode = if (args.length > 2) args(2) else ""
    val validModes = Set("", "parquet", "pin", "parquet-pin")
    if (!validModes(mode)) {
      System.err.println(s"unknown mode '$mode' (valid: parquet, pin, parquet-pin, or omit)")
      sys.exit(2)
    }
    val fromParquet = mode == "parquet" || mode == "parquet-pin"
    val pinned = mode == "pin" || mode == "parquet-pin"
    val originalAffinity = if (pinned) currentAffinity() else ""
    val coreLevels = Seq(4, 8, 16, 32)
    val partitions = 256
    val best = scala.collection.mutable.Map.empty[Int, Double].withDefaultValue(Double.MaxValue)

    val corpusPath = s"/tmp/graft_corpus_$nDocs"
    // warmup JVM once at max parallelism (+ materialize corpus if needed)
    locally {
      val s = session(32)
      import s.implicits._
      val docs = graft.io.SyntheticCorpus.docs(s, nDocs, partitions = partitions)
      if (fromParquet && !new java.io.File(corpusPath, "_SUCCESS").exists())
        docs.write.mode("overwrite").parquet(corpusPath)
      graft.pipeline.Extract.run(
        if (fromParquet) s.read.parquet(corpusPath).as[graft.model.InputDoc] else docs).count()
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    for (pass <- 1 to passes; cores <- coreLevels) {
      if (pinned) pinCpus(s"0-${cores - 1}")
      val s = session(cores)
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val t0 = System.nanoTime()
      val n =
        if (fromParquet) {
          // the production scan shape: nested-pruned read + extract,
          // via the same helpers Checkpoint uses
          graft.pipeline.Extract.runLines(
            graft.io.TableIO.pruneLines(s.read.parquet(corpusPath))).count()
        } else {
          graft.pipeline.Extract.run(
            graft.io.SyntheticCorpus.docs(s, nDocs, partitions = partitions)).count()
        }
      assert(n == nDocs)
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec < best(cores)) best(cores) = sec
      System.err.println(f"pass=$pass cores=$cores sec=$sec%.3f")
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
    if (pinned) pinCpus(originalAffinity)

    val thr = coreLevels.map(c => c -> nDocs / best(c)).toMap
    def eff(lo: Int, hi: Int): Double = (thr(hi) / thr(lo)) / (hi.toDouble / lo)
    val results = coreLevels.map(c =>
      f""""c$c":{"sec":${best(c)}%.3f,"docs_per_sec":${thr(c)}%.1f}""").mkString(",")
    println(
      f"""{"n_docs":$nDocs,"partitions":$partitions,"mode":"${if (mode.isEmpty) "generate" else mode}",$results,""" +
        f""""eff_4_to_16":${eff(4, 16)}%.3f,"eff_8_to_32":${eff(8, 32)}%.3f}""")
  }
}
