package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Same-JVM A/B benchmark: runs two variants of a query INTERLEAVED in
  * one session (A,B,B,A,A,B,… — order alternates per round so ordering
  * bias cancels), reporting per-query medians and the A/B ratio.
  *
  * Purpose: the sandbox VM's cross-run variance (documented 5x windows in
  * BASELINE.md) makes per-round driver bench records incomparable across
  * rounds. Within ONE JVM + one interleaved schedule, that weather hits
  * both variants equally, so the ratio isolates real code cost:
  *   - identical-code pairs (A == B == HEAD) measure the same-JVM noise
  *     envelope — a cross-round drift smaller than this envelope is
  *     weather, not regression;
  *   - parameter pairs (e.g. simhashPairs capped vs uncapped) measure a
  *     real implementation delta under controlled conditions.
  *
  * Usage: runMain graft.BenchAB [pairName ...]   (default: all pairs)
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32), BENCH_AB_ROUNDS (default 5).
  * Prints one JSON line per pair plus a summary line.
  */
object BenchAB {

  type Q = (SparkSession, String) => DataFrame

  /** A named A/B pair; `identical` tags noise-envelope pairs EXPLICITLY
    * (not by name convention) so a future parameter pair can never
    * corrupt the envelope summary. */
  final case class Pair(a: Q, b: Q, identical: Boolean)

  def pairs: Map[String, Pair] = {
    def same(name: String): Pair =
      Pair(SparkEntry.queries(name), SparkEntry.queries(name), identical = true)
    Map(
      // the three queries whose r02->r03 driver-bench drift had NO code
      // change (verified by git diff) — expected verdict: weather
      "q_lsh_jaccard" -> same("q_lsh_jaccard"),
      "q_lsh_pairs" -> same("q_lsh_pairs"),
      "x_extract_relational" -> same("x_extract_relational"),
      // hash-family seam: oracle-reproducible md5 vs production xxhash64
      // (codegen 64-bit, 8-byte sig in the shuffle instead of ~36)
      "minhash_md5_vs_xxhash64" -> Pair(
        (s: SparkSession, dir: String) => graft.ops.Dedup.lshCandidatePairs(
          graft.ops.Dedup.minhashSignatures(
            s.read.parquet(s"$dir/documents.parquet"), bands = 8, shingleK = 8),
          maxBucket = 50),
        (s: SparkSession, dir: String) => graft.ops.Dedup.lshCandidatePairs(
          graft.ops.Dedup.minhashSignatures(
            s.read.parquet(s"$dir/documents.parquet"), bands = 8, shingleK = 8,
            hashFamily = "xxhash64"),
          maxBucket = 50),
        identical = false),
      // the one REAL r03 cost: default-on simhash cap (collect_list agg)
      // vs the classic uncapped self-join it replaced
      "simhash_cap_vs_uncapped" -> Pair(
        (s: SparkSession, dir: String) => graft.ops.Dedup.simhashPairs(
          s.read.parquet(s"$dir/documents.parquet")
            .withColumn("doc_id", org.apache.spark.sql.functions.col("doc_id").cast("string")),
          maxDist = 16),
        (s: SparkSession, dir: String) => graft.ops.Dedup.simhashPairs(
          s.read.parquet(s"$dir/documents.parquet")
            .withColumn("doc_id", org.apache.spark.sql.functions.col("doc_id").cast("string")),
          maxDist = 16, maxBucket = Int.MaxValue),
        identical = false),
      // r05 skew fix: legacy collect-first capped shape (full member list
      // materialized, THEN size-filtered — unbounded buffer on a hot
      // bucket) vs the shipped count-first shape (sizes counted, hot
      // buckets dropped before any list exists, ReuseExchange shuffles
      // the blocks once)
      "capped_countfirst_vs_collectfirst" -> Pair(
        (s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions._
          val docs = s.read.parquet(s"$dir/documents.parquet")
            .withColumn("doc_id", col("doc_id").cast("string"))
          val blocks = graft.ops.Dedup.simhashBlocks(docs)
          val buckets = blocks
            .groupBy(col("blk"), col("key"))
            .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("members"))
            .where(size(col("members")) >= 2 && size(col("members")) <= 1000)
          buckets
            .select(col("members"), posexplode(col("members")))
            .withColumnRenamed("pos", "i").withColumnRenamed("col", "a")
            .select(col("a"),
              explode(slice(col("members"), col("i") + lit(2), size(col("members")))).as("b"))
            .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
            .where(col("doc_a") < col("doc_b"))
            .distinct()
            .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
            .where(col("hamming") <= 16)
            .select("doc_a", "doc_b", "hamming")
        },
        (s: SparkSession, dir: String) => graft.ops.Dedup.simhashPairs(
          s.read.parquet(s"$dir/documents.parquet")
            .withColumn("doc_id", org.apache.spark.sql.functions.col("doc_id").cast("string")),
          maxDist = 16),
        identical = false),
      // r6: window capped shape (default, digest-pinned) vs the heavy-key
      // prefilter on a NATURAL corpus — the prefilter re-derives the
      // blocks once per pass, so on non-hostile data it should be ~noise
      // for cheap derivations (simhash) while SkewBench shows its win on
      // hostile skew
      "capped_window_vs_prefilter" -> Pair(
        (s: SparkSession, dir: String) => graft.ops.Dedup.simhashPairs(
          s.read.parquet(s"$dir/documents.parquet")
            .withColumn("doc_id", org.apache.spark.sql.functions.col("doc_id").cast("string")),
          maxDist = 16),
        (s: SparkSession, dir: String) => graft.ops.Dedup.simhashPairs(
          s.read.parquet(s"$dir/documents.parquet")
            .withColumn("doc_id", org.apache.spark.sql.functions.col("doc_id").cast("string")),
          maxDist = 16, hotKeyPrefilter = true),
        identical = false),
      // r6: the whole-page-vote similarity matrix with the full difflib
      // matcher on EVERY pair vs the shipped equal-text short-circuit
      // (ratio of identical sequences is provably 1.0 — property-pinned
      // in EnsembleSpec). Same (base, base, degraded) engine triplet the
      // x_ensemble_vote gate uses; outputs are value-identical, only the
      // n self-pairs + verbatim-agreement pairs skip the quadratic pass.
      "ensemble_fullmatrix_vs_shortcut" -> Pair(
        ensembleMatrixQuery(useShortcut = false),
        ensembleMatrixQuery(useShortcut = true),
        identical = false),
      // r6: the substring-span dedup's hash-family seam — the oracle
      // md5 family (32-char hex per window in the hash shuffle) vs the
      // production xxhash64 (codegen, 8 bytes). One hash per character
      // of the corpus, so this pair bounds the op's dominant cost.
      // Span sets are identical mod 64-bit collisions (spec-pinned).
      "dupspans_md5_vs_xxhash64" -> Pair(
        (s: SparkSession, dir: String) => graft.ops.Dedup.duplicateSpans(
          s.read.parquet(s"$dir/documents.parquet"), k = 8),
        (s: SparkSession, dir: String) => graft.ops.Dedup.duplicateSpans(
          s.read.parquet(s"$dir/documents.parquet"), k = 8, hashFamily = "xxhash64"),
        identical = false),
      // r6: the gate-only input spread on an ALREADY well-partitioned
      // source (repartition(64) simulates a cluster-scale input): the
      // default pays a redundant corpus-text exchange, spread=false
      // skips it. Values identical (DupSpansSpec parity pin).
      "dupspans_spread_vs_nospread_prepartitioned" -> Pair(
        (s: SparkSession, dir: String) => graft.ops.Dedup.duplicateSpans(
          s.read.parquet(s"$dir/documents.parquet").repartition(64), k = 8,
          hashFamily = "xxhash64"),
        (s: SparkSession, dir: String) => graft.ops.Dedup.duplicateSpans(
          s.read.parquet(s"$dir/documents.parquet").repartition(64), k = 8,
          hashFamily = "xxhash64", spread = false),
        identical = false),
      // r7: the pre-kernel relational MinHash derivation (explode
      // shingles x explode bands -> groupBy(doc, band).min — ~8x the
      // corpus characters in intermediate rows) vs the shipped one-pass
      // minhash_sigs kernel, both md5, both feeding the same capped
      // bucket join. Signatures bit-identical (FunctionsSpec pins
      // kernel == relational; q_lsh_pairs oracle unchanged).
      "minhash_exploded_vs_kernel" -> Pair(
        (s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions._
          val docs = s.read.parquet(s"$dir/documents.parquet")
            .repartition(s.sparkContext.defaultParallelism * 2, col("doc_id"))
          val sigs = docs
            .select(col("doc_id"),
              explode(array_distinct(graft.ops.Dedup.shingles(col("text"), 8))).as("sh"))
            .select(col("doc_id"), explode(sequence(lit(0), lit(7))).as("band"), col("sh"))
            .groupBy(col("doc_id"), col("band"))
            .agg(min(md5(concat(col("band").cast("string"), lit(":"), col("sh")))).as("sig"))
          graft.ops.Dedup.lshCandidatePairs(sigs, maxBucket = 50)
        },
        SparkEntry.queries("q_lsh_pairs"),
        identical = false),
      // r7: the span-dedup window hashing as the pre-kernel interpreted
      // transform/substring HOF vs the shipped window_hashes kernel
      // (one pass over the UTF-8 bytes), both xxhash64. Hash values
      // bit-identical (FunctionsSpec).
      "dupspans_hof_vs_kernel" -> Pair(
        (s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions._
          val docs = s.read.parquet(s"$dir/documents.parquet")
            .repartition(s.sparkContext.defaultParallelism * 2, col("doc_id"))
          val text = col("text")
          val k = 8
          val windows = when(length(text) >= k,
            transform(sequence(lit(1), length(text) - (k - 1)),
              i => xxhash64(substring(text, i, lit(k)))))
            .otherwise(expr("CAST(array() AS array<bigint>)"))
          val pos = docs
            .select(col("doc_id"), posexplode(windows).as(Seq("off", "h")))
            .select(col("doc_id"), (col("off") + 1).cast("long").as("pos"), col("h"))
          val byHash = org.apache.spark.sql.expressions.Window.partitionBy("h")
          val byDoc = org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy("pos")
          pos
            .withColumn("d_min", min("doc_id").over(byHash))
            .withColumn("d_max", max("doc_id").over(byHash))
            .where(col("d_min") =!= col("d_max"))
            .select("doc_id", "pos")
            .withColumn("island", col("pos") - row_number().over(byDoc))
            .groupBy(col("doc_id"), col("island"))
            .agg(min("pos").as("span_start"),
              (max(col("pos")) + lit(k - 1)).as("span_end"),
              (max(col("pos")) - min(col("pos")) + lit(k)).as("span_len"))
            .select("doc_id", "span_start", "span_end", "span_len")
        },
        (s: SparkSession, dir: String) => graft.ops.Dedup.duplicateSpans(
          s.read.parquet(s"$dir/documents.parquet"), k = 8, hashFamily = "xxhash64"),
        identical = false),
      // r7: the LSH->Jaccard verifier's per-pair set math as built-ins
      // (size(array_intersect) + size(array_union): two hash sets + two
      // materialized arrays per candidate pair) vs the shipped
      // intersect_count kernel + |A|+|B|-|A∩B| union arithmetic. Values
      // identical (FunctionsSpec differential; q_lsh_jaccard oracle).
      // Timed through a noop-equivalent full materialization: the
      // jaccard COLUMN is the product here, so count()-style pruning
      // would time the wrong thing — both arms aggregate over jaccard.
      "jaccard_builtins_vs_kernel" -> Pair(
        (s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions._
          val docs = s.read.parquet(s"$dir/documents.parquet")
          val pairs = graft.ops.Dedup.lshCandidatePairs(
            graft.ops.Dedup.minhashSignatures(docs, bands = 8, shingleK = 8), maxBucket = 50)
          val sets = docs.select(col("doc_id"),
            array_distinct(graft.ops.Dedup.wordNgrams(col("text"), 3)).as("ngrams"))
          pairs
            .join(sets.withColumnRenamed("ngrams", "ngrams_a"), pairs("doc_a") === sets("doc_id"))
            .drop("doc_id")
            .join(sets.withColumnRenamed("ngrams", "ngrams_b"), pairs("doc_b") === sets("doc_id"))
            .drop("doc_id")
            .withColumn("inter", size(array_intersect(col("ngrams_a"), col("ngrams_b"))))
            .withColumn("uni", size(array_union(col("ngrams_a"), col("ngrams_b"))))
            .select(col("doc_a"), col("doc_b"),
              round(col("inter").cast("double") / greatest(col("uni"), lit(1)), 4).as("jaccard"))
            .agg(sum(col("jaccard")), count(lit(1)))
        },
        (s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions._
          val docs = s.read.parquet(s"$dir/documents.parquet")
          val pairs = graft.ops.Dedup.lshCandidatePairs(
            graft.ops.Dedup.minhashSignatures(docs, bands = 8, shingleK = 8), maxBucket = 50)
          graft.ops.Dedup.ngramJaccard(docs, pairs, n = 3)
            .agg(sum(col("jaccard")), count(lit(1)))
        },
        identical = false),
      // r7: a heavy per-doc map chained directly on the gate parquet's
      // single 128MB-split (ONE task does the whole corpus) vs the
      // scale-adaptive spread the shipped x_ensemble_vote now applies.
      // Rows identical; only scan parallelism differs. Both arms run
      // the FULL x_ensemble_vote body (vote + fallback per doc).
      "ensemble_narrow_vs_spread" -> Pair(
        (s: SparkSession, dir: String) => {
          import s.implicits._
          import org.apache.spark.sql.functions.col
          s.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("text")).as[(Long, String)]
            .mapPartitions(_.map { case (id, text) =>
              val base = Option(text).getOrElse("").take(240)
              val degraded = base.replaceAll("[aeiouあい]", "")
              val engines = Vector("yomitoku", "paddleocr", "easyocr")
              val bad = (id % 3).toInt
              val results = engines.zipWithIndex.map { case (e, i) =>
                e -> (if (i == bad) degraded else base)
              }
              val (winText, winEngine, votes) = graft.vote.Ensemble.voteBestResult(results)
              val (fbText, fbEngine) = graft.vote.Ensemble.ocrWithFallback(results)
              (id, winEngine, votes.getOrElse(winEngine, 0), winText.length,
                fbEngine, fbText == winText)
            }).toDF("doc_id", "vote_engine", "votes", "len", "fallback_engine", "agree")
        },
        (s: SparkSession, dir: String) =>
          SparkEntry.queries("x_ensemble_vote")(s, dir),
        identical = false),
      // r6: ROVER char alignment with the quadratic matcher forced on
      // verbatim-equal engine texts (the pre-shortcut cost on clean
      // lines) vs the shipped Arrays.equals shortcut. Values identical —
      // SeqRatioSpec pins shortcut==full and the x_rover_vote digests
      // are unchanged.
      "rover_align_fullmatcher_vs_shortcut" -> Pair(
        roverAlignQuery(eqShortcut = false),
        roverAlignQuery(eqShortcut = true),
        identical = false),
      // r6: the legacy q_phash_dedup frame-hash generation (explode 60
      // idx x 60 bits -> partial-agg sum -> collect_list: two exchanges,
      // 18M intermediate rows at sf0.1) vs the shipped in-row nested-HOF
      // shape (zero exchanges). Values identical — the oracle hash gate
      // runs on the shipped shape.
      "phash_explode_vs_inrow" -> Pair(
        (s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions._
          import s.implicits._
          val docs = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
          val frames = docs
            .select(col("doc_id"), explode(sequence(lit(1), lit(60))).as("idx"))
            .select(col("doc_id"), col("idx"), explode(sequence(lit(0), lit(59))).as("b"))
            .withColumn("base",
              (col("doc_id") * (col("b") + 3) + expr("idx div 5") * (col("b") + 11)) % 7 < 3)
            .withColumn("noise", (col("doc_id") + col("idx") * 17 + col("b") * 29) % 40 === 0)
            .groupBy(col("doc_id"), col("idx"))
            .agg(sum(when(col("base") =!= col("noise"),
              expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L)).as("h"))
          frames
            .groupBy(col("doc_id"))
            .agg(sort_array(collect_list(struct(col("idx"), col("h")))).as("fs"))
            .as[(Long, Seq[(Int, Long)])]
            .map { case (id, fs) => (id, fs.length, graft.pipeline.PhashDedup.dedupe(fs).length) }
            .toDF("doc_id", "n_frames", "n_unique")
        },
        SparkEntry.queries("q_phash_dedup"),
        identical = false),
      // r5: five-regex language-ID vs the single-pass codegen expression
      "langid_regex_vs_codegen" -> Pair(
        (s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions._
          val t = col("text")
          val len = greatest(length(t), lit(1))
          def cls(re: String) = length(regexp_replace(t, re, ""))
          s.read.parquet(s"$dir/documents.parquet")
            .select(col("lang"),
              when(cls("[^\\u3040-\\u30ff]").cast("double") / len > 0.1, "ja")
                .when(cls("[^\\uac00-\\ud7af]").cast("double") / len > 0.1, "ko")
                .when(cls("[^\\u4e00-\\u9fff]").cast("double") / len > 0.3, "zh")
                .when(cls("[^\\u0400-\\u04ff]").cast("double") / len > 0.3, "ru")
                .when(cls("[^a-zA-Z]").cast("double") / len > 0.3, "en")
                .otherwise("unknown").as("pred_lang"))
            .groupBy(col("lang"), col("pred_lang"))
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"))
        },
        (s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions._
          s.read.parquet(s"$dir/documents.parquet")
            .select(col("lang"),
              graft.ops.TextAnalytics.langIdExpr(col("text")).as("pred_lang"))
            .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
        },
        identical = false),
      // r04-verdict #6: legacy rare-trigram shape (ALL doc-trigram
      // occurrences joined against the FULL model, n_tri from the join)
      // vs the shipped shape (join-free n_tri + model pre-filtered to its
      // rare subset before the join)
      "raretri_fulljoin_vs_prefilter" -> Pair(
        (s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions._
          val docs = s.read.parquet(s"$dir/documents.parquet")
          val tris = docs.select(col("doc_id"),
            explode(graft.ops.Dedup.shingles(col("text"), 3)).as("tri"))
          val model = tris.groupBy(col("tri")).agg(count(lit(1)).as("cnt"))
          val thr = docs.agg(floor(count(lit(1)) / 5).cast("long").as("rare_thr"))
          tris.join(model, "tri").join(broadcast(thr))
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_tri"),
              sum(when(col("cnt") <= col("rare_thr"), 1L).otherwise(0L)).as("n_rare"))
            .withColumn("rare_ratio",
              round(col("n_rare").cast("double") / col("n_tri"), 4))
        },
        (s: SparkSession, dir: String) => graft.ops.TextAnalytics
          .rareTrigramScoresScaleFree(s.read.parquet(s"$dir/documents.parquet")),
        identical = false)
    )
  }

  /** The x_rover_vote alignment kernel on its dominant input class:
    * three engines agreeing verbatim on each line (clean-OCR common
    * case; exactly what the gate's synthetic triplet produces).
    * `eqShortcut=false` forces the full quadratic matcher per engine
    * pair — the pre-r6 cost. Only `.count()` is timed; value parity
    * rests on the SeqRatioSpec shortcut==full property pin. */
  private def roverAlignQuery(eqShortcut: Boolean): Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.functions.col
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        // null-text guard (ADVICE r6): the dedup trio supports null-text
        // corpora; an A/B arm must not NPE on one
        val line = Option(text).getOrElse("").take(160)
        val texts = Vector("yomitoku" -> line, "paddleocr" -> line, "easyocr" -> line)
        val pos = graft.vote.Rover.alignTextsCharacterLevel(texts, eqShortcut)
        (id, pos.length)
      }).toDF("doc_id", "n_positions")
  }

  /** The x_ensemble_vote similarity-matrix kernel: per doc, the 3x3
    * engine matrix over (base, base, degraded) texts. `useShortcut=false`
    * forces the full quadratic matcher on every pair (the pre-r6b cost);
    * `true` is the shipped [[graft.vote.Ensemble.calculateSimilarity]].
    * NOTE: the harness only times `.count()` — it does NOT compare the
    * emitted values; value parity of the shortcut rests on the
    * EnsembleSpec property pin (ratio(a,a) == 1.0 under autojunk). */
  private def ensembleMatrixQuery(useShortcut: Boolean): Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.functions.col
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        // null-text guard (ADVICE r6)
        val base = Option(text).getOrElse("").take(240)
        val degraded = base.replaceAll("[aeiouあい]", "")
        val texts = Vector(base, base, degraded)
        var sim = 0.0
        for (t1 <- texts; t2 <- texts)
          sim += (if (useShortcut) graft.vote.Ensemble.calculateSimilarity(t1, t2)
            else if (t1.isEmpty && t2.isEmpty) 1.0
            else if (t1.isEmpty || t2.isEmpty) 0.0
            else graft.text.SeqRatio.ratio(t1, t2))
        (id, math.rint(sim * 1e6) / 1e6)
      }).toDF("doc_id", "sim_sum")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("BENCH_AB_ROUNDS", "5").toInt
    val selected = if (args.isEmpty) pairs.keys.toSeq.sorted else args.toSeq
    // validate BEFORE spinning up Spark: a typo'd pair name should list
    // the valid names, not crash after session startup
    val unknown = selected.filterNot(pairs.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown pair(s): ${unknown.mkString(", ")} " +
        s"(valid: ${pairs.keys.toSeq.sorted.mkString(", ")})")
      sys.exit(2)
    }
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

    val results = selected.map { name =>
      val Pair(qa, qb, identical) = pairs(name)
      // warmup both variants (JIT + codegen), then interleave
      qa(spark, sfDir).count(); qb(spark, sfDir).count()
      val as = Vector.newBuilder[Double]
      val bs = Vector.newBuilder[Double]
      (0 until rounds).foreach { r =>
        if (r % 2 == 0) { as += time(qa(spark, sfDir).count()); bs += time(qb(spark, sfDir).count()) }
        else { bs += time(qb(spark, sfDir).count()); as += time(qa(spark, sfDir).count()) }
      }
      val (ma, mb) = (median(as.result()), median(bs.result()))
      val ratio = if (ma > 0) mb / ma else -1.0
      println(f"""{"pair":"$name","identical":$identical,"a_median":$ma%.3f,"b_median":$mb%.3f,"b_over_a":$ratio%.3f,"a_runs":[${as.result().map(t => f"$t%.3f").mkString(",")}],"b_runs":[${bs.result().map(t => f"$t%.3f").mkString(",")}]}""")
      (name, ma, mb, ratio, identical)
    }
    val identicalPairs = results.filter(_._5)
    val envelope = if (identicalPairs.nonEmpty)
      identicalPairs.map { case (_, _, _, r, _) => math.max(r, 1.0 / r) }.max else -1.0
    println(f"""{"metric":"ab_summary","pairs":${results.size},"rounds":$rounds,"identical_pair_envelope":$envelope%.3f,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
