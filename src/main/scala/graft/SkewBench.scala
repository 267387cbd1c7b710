package graft

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-skew rehearsal: prove the hot-bucket caps at BENCH scale,
  * not just unit-spec size. The hostile corpus (deterministic, generated
  * in-place) is built so the hot bucket IS the corpus:
  *
  *   [0, 100k)        hot    — ONE text duplicated 100,000x (the
  *                             degenerate bucket every cap exists for)
  *   [100k, 150k)     boiler — 700 distinct template texts x ~71 copies
  *                             (boilerplate-heavy band: big exact-dup
  *                             groups AND over-cap near-dup buckets)
  *   [150k, 150.5k)   warm   — 500 near-dups of one base (a bucket
  *                             UNDER the cap: real pair expansion must
  *                             still happen, caps must not kill it)
  *   [150.5k, 199k)   tail   — unique random texts (long tail)
  *   [199k, 199.5k)   echo_warm — exact copies of warm-family docs
  *   [199.5k, 200k)   echo_hot  — copies of the hot text
  *
  * The echo bands drive the streaming-ingest path: an index over
  * [0, 199k) receives [199k, 200k) as "arriving" docs — echo_warm must
  * MATCH (bucket under cap), echo_hot must be SUPPRESSED (bucket over
  * cap) with the drop visible in the suppression metrics, never silent.
  *
  * Each dedup-family op runs end-to-end with its Observation; output is
  * one JSON line per op: wall seconds, result rows, suppressed buckets/
  * rows. The pass criterion (BASELINE.md table): no op super-linear in
  * its OUTPUT, the hot mass suppressed observably, the warm mass still
  * found.
  *
  * Usage: runMain graft.SkewBench   (env: SKEW_N default 200000,
  * SKEW_DIR default /tmp/skew_corpus, SPARK_GRAFT_CPUS default 32)
  */
object SkewBench {

  final val Dim = 64

  /** Deterministic hostile corpus: (documents, embeddings) parquet under
    * `dir`. Same doc_id space for both. */
  def generate(spark: SparkSession, dir: String, n: Long): Unit = {
    import spark.implicits._
    require(n >= 200000, s"layout needs n >= 200000, got $n")
    val hotEnd = 100000L
    val boilerEnd = 150000L
    val warmEnd = 150500L
    val tailEnd = n - 1000
    val echoWarmEnd = n - 500

    val hotText = ("the quick brown fox jumps over the lazy dog while the " +
      "spark executor shuffles partitions across the cluster ring").trim
    val warmBase = "warm near duplicate family base text with stable shared " +
      "vocabulary tokens alpha beta gamma delta epsilon zeta eta theta"
    def boilerText(id: Long): String = {
      val t = id % 20; val v = id % 50; val m = id % 7
      s"boilerplate template $t common header words repeated across the band " +
        s"with variant token v$v and marker m$m plus shared tail filler text"
    }
    def warmText(id: Long): String = {
      val k = id - 150000L
      s"$warmBase mutated token u$k"
    }
    def tailText(id: Long): String = {
      val r = new scala.util.Random(id * 2654435761L + 17)
      (0 until 24).map(_ => s"w${r.nextInt(500000)}").mkString(" ")
    }
    val docs = spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 2)
      .map { boxed =>
        val id: Long = boxed
        val text =
          if (id < hotEnd) hotText
          else if (id < boilerEnd) boilerText(id)
          else if (id < warmEnd) warmText(id)
          else if (id < tailEnd) tailText(id)
          // exact copies of warm-family docs: the stream side must MATCH
          // these against the index (bucket under the cap)
          else if (id < echoWarmEnd) warmText(150000L + (id % 500))
          else hotText
        (id.toString, text)
      }.toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents")

    def unit(v: Array[Float]): Array[Float] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      val inv = (1.0 / math.sqrt(math.max(s, 1e-12))).toFloat
      v.map(_ * inv)
    }
    def gauss(seed: Long, scale: Float): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(Dim)((r.nextGaussian() * scale).toFloat)
    }
    val hotVec = unit(gauss(42L, 1f))
    val warmVec = unit(gauss(4242L, 1f))
    val centers = (0 until 20).map(c => unit(gauss(1000L + c, 1f))).toArray
    val emb = spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 2)
      .map { boxed =>
        val id: Long = boxed
        val v =
          if (id < hotEnd) hotVec
          else if (id < boilerEnd)
            unit(centers((id % 20).toInt).zip(gauss(id, 0.35f)).map { case (a, b) => a + b })
          else if (id < warmEnd)
            unit(warmVec.zip(gauss(id, 0.01f)).map { case (a, b) => a + b })
          else if (id < tailEnd) unit(gauss(id * 7 + 3, 1f))
          else if (id < echoWarmEnd) warmVec
          else hotVec
        (id, v)
      }.toDF("vec_id", "embedding")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings")
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SKEW_N", "200000").toLong
    val dir = sys.env.getOrElse("SKEW_DIR", "/tmp/skew_corpus")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      // driver heap comes from the LAUNCHING JVM: build.sbt wires
      // SPARK_DRIVER_MEM into the forked -Xmx (setting
      // spark.driver.memory after JVM start is a no-op in local mode)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    generate(spark, dir, n)
    println(f"""{"op":"generate","wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f,"n":$n}""")

    def docs = spark.read.parquet(s"$dir/documents")
    def emb = spark.read.parquet(s"$dir/embeddings")
    val indexCut = n - 1000 // echo bands arrive as the "stream"

    def run(op: String, observed: Boolean = true)(
        build: Option[Observation] => DataFrame): Unit = {
      val obs = if (observed) Some(new Observation(s"skew_$op")) else None
      // shuffle bytes are the quantity that scales with the hot mass
      // (wall time at 200k is memory-resident and host-noise-dominated):
      // a shape that keeps a 10^9-copy hot key out of the exchange shows
      // up HERE long before the local corpus is big enough to spill
      val shuffled = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          shuffled.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      val t = System.nanoTime()
      val rows = build(obs).count()
      val wall = (System.nanoTime() - t) / 1e9
      // listener delivery is async: let the byte counter settle
      var last = -1L
      while (shuffled.get != last) { last = shuffled.get; Thread.sleep(200) }
      spark.sparkContext.removeSparkListener(listener)
      // get blocks until the observed action's metrics land (an op that
      // takes no Observation must pass observed = false — get on an
      // unattached Observation never returns)
      val m = obs.map(_.get).getOrElse(Map.empty[String, Any])
      val sb = m.get("suppressed_buckets").map(_.toString).getOrElse("null")
      val sr = m.get("suppressed_rows").map(_.toString).getOrElse("null")
      println(f"""{"op":"$op","wall_sec":$wall%.2f,"rows":$rows,"shuffle_mb":${shuffled.get / 1048576.0}%.1f,"suppressed_buckets":$sb,"suppressed_rows":$sr}""")
    }

    // exact dedup: uncapped by design — the 100k clique is ONE group row
    run("exact_dup_groups", observed = false) { _ => graft.ops.Dedup.exactDupGroups(docs) }
    // MinHash-LSH with the production hash family, capped buckets
    run("lsh_candidate_pairs") { o =>
      graft.ops.Dedup.lshCandidatePairs(
        graft.ops.Dedup.minhashSignatures(docs, bands = 8, shingleK = 8,
          hashFamily = "xxhash64"),
        maxBucket = 1000, suppressed = o)
    }
    // ... and with the heavy-key prefilter: the hot mass dies map-side
    // before the bucket exchange (signature derivation runs twice — the
    // documented trade; on THIS corpus the hot band dominates, so the
    // prefilter should win despite it)
    run("lsh_candidate_pairs_prefilter") { o =>
      graft.ops.Dedup.lshCandidatePairs(
        graft.ops.Dedup.minhashSignatures(docs, bands = 8, shingleK = 8,
          hashFamily = "xxhash64"),
        maxBucket = 1000, suppressed = o, hotKeyPrefilter = true)
    }
    // SimHash pairs, default cap
    run("simhash_pairs") { o =>
      graft.ops.Dedup.simhashPairs(docs, maxDist = 3, maxBucket = 1000, suppressed = o)
    }
    run("simhash_pairs_prefilter") { o =>
      graft.ops.Dedup.simhashPairs(docs, maxDist = 3, maxBucket = 1000, suppressed = o,
        hotKeyPrefilter = true)
    }
    // embedding near-dups, capped SRP buckets. nPlanes follows the
    // occupancy math (Similarity scaladoc): at N=200k, 16 planes put
    // ~3 uniform vectors per bucket — 8 planes would make EVERY bucket
    // ~780 strong and the op quadratic-ish in noise pairs (measured
    // 50 s / 74M candidates before this tuning). maxBucket=2000 keeps
    // the 1000-strong warm family under the cap while the 100.5k hot
    // bucket and the 2.5k boiler clusters suppress observably.
    run("embedding_neardups") { o =>
      graft.ops.Similarity.embeddingNearDups(emb, dimCount = Dim,
        threshold = 0.95, nPlanes = 16, bands = 4, maxBucket = 2000, suppressed = o)
    }
    run("embedding_neardups_prefilter") { o =>
      graft.ops.Similarity.embeddingNearDups(emb, dimCount = Dim,
        threshold = 0.95, nPlanes = 16, bands = 4, maxBucket = 2000, suppressed = o,
        hotKeyPrefilter = true)
    }
    // streaming-ingest near-dup in batch mode: echo bands vs the corpus
    // index (hot bucket suppressed AT THE INDEX, warm echoes must match)
    run("stream_neardup_batch") { o =>
      val index = graft.streaming.NearDupStream.corpusIndex(
        docs.where(col("doc_id").cast("long") < indexCut),
        maxBucket = 1000, suppressed = o)
      graft.streaming.NearDupStream.candidates(
        docs.where(col("doc_id").cast("long") >= indexCut), index, maxDist = 3)
        .dropDuplicates("doc_id", "corpus_id")
    }

    // exact substring-span dedup: output is LINEAR (each character
    // position emits at most once per doc), so no cap exists by design;
    // the hot text's ~108 window hashes each drag 100.5k rows into the
    // hash exchange — the spill-not-OOM window contract under the most
    // hostile ratio (the hot band IS half the corpus). Expect a few
    // spans per covered doc (hot/echo_hot full-cover; boiler split by
    // its variant tokens; tail docs share real 8-char windows through
    // the w<id> vocabulary) — never pair expansion like the LSH ops.
    run("duplicate_spans", observed = false) { _ =>
      graft.ops.Dedup.duplicateSpans(docs, k = 8, hashFamily = "xxhash64")
    }

    // ---- deep-hot rehearsal: the bucket stage IS the op ------------------
    // On the mixed corpus above, pair expansion dominates both wall and
    // shuffle, so the two capped shapes look alike. This band is the
    // regime the prefilter exists for — a corpus that is ~ALL one hot
    // key (the 10^9-copy-at-scale shape, miniaturized): the window shape
    // must shuffle (and at scale spill) every hot row before dropping
    // it; the prefilter's count pass moves one summary row per map
    // partition and the hot mass dies map-side, never entering an
    // exchange. Expect a material drop in shuffled bytes AND wall here.
    val deepN = sys.env.getOrElse("SKEW_DEEP_N", "2000000").toLong
    locally {
      import spark.implicits._
      val hotText = "deep hot corpus single text repeated across almost every document"
      spark.range(0, deepN, 1, spark.sparkContext.defaultParallelism * 2)
        .map { boxed =>
          val id: Long = boxed
          val text =
            if (id % 4000 == 1999) // 0.025% warm family (500 copies, under the
              "deep warm family text shared by a small under-cap clique of docs"
            else if (id % 200 == 199) { // cap) + 0.5% unique tail: non-empty
              val r = new scala.util.Random(id * 2654435761L + 3) // result, so
              (0 until 16).map(_ => s"w${r.nextInt(400000)}").mkString(" ") // the
            } else hotText // suppression metrics deliver (no AQE empty-plan prune)
          (id.toString, text)
        }.toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/deephot")
    }
    def deep = spark.read.parquet(s"$dir/deephot")
    run("deep_hot_simhash_window") { o =>
      graft.ops.Dedup.simhashPairs(deep, maxDist = 3, maxBucket = 1000, suppressed = o)
    }
    run("deep_hot_simhash_prefilter") { o =>
      graft.ops.Dedup.simhashPairs(deep, maxDist = 3, maxBucket = 1000, suppressed = o,
        hotKeyPrefilter = true)
    }
    spark.stop()
  }
}
