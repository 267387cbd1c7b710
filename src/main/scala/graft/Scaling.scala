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
    * CPUs 0..n-1; no-op if taskset is unavailable. */
  private def pinCpus(n: Int): Unit = {
    val pid = ProcessHandle.current().pid()
    try {
      val p = new ProcessBuilder("taskset", "-apc", s"0-${n - 1}", pid.toString)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .redirectErrorStream(true).start()
      p.waitFor()
    } catch { case _: java.io.IOException => () }
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
    val fromParquet = mode.startsWith("parquet")
    val pinned = mode == "pin" || mode == "parquet-pin"
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
      if (pinned) pinCpus(cores)
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
    if (pinned) pinCpus(Runtime.getRuntime.availableProcessors())

    val thr = coreLevels.map(c => c -> nDocs / best(c)).toMap
    def eff(lo: Int, hi: Int): Double = (thr(hi) / thr(lo)) / (hi.toDouble / lo)
    val results = coreLevels.map(c =>
      f""""c$c":{"sec":${best(c)}%.3f,"docs_per_sec":${thr(c)}%.1f}""").mkString(",")
    println(
      f"""{"n_docs":$nDocs,"partitions":$partitions,"mode":"${if (mode.isEmpty) "generate" else mode}",$results,""" +
        f""""eff_4_to_16":${eff(4, 16)}%.3f,"eff_8_to_32":${eff(8, 32)}%.3f}""")
  }
}
