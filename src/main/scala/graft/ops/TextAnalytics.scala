package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline,
  * expressed as pure Column expressions (whole-stage-codegen friendly, no
  * UDFs in the hot path). Each has a DuckDB-expressible oracle in
  * SparkEntry so the driver's correctness gate covers it.
  */
object TextAnalytics {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish sub-token count: words + digit runs + punctuation islands.
    * A cheap stand-in for tokenizer-cost estimation at corpus scale. */
  def bpeishCount(text: Column): Column =
    size(filter(split(text, "(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|\\s+|(?=[^a-zA-Z0-9\\s])"),
      t => length(t) > 0))

  /** Quality metrics: length, alpha ratio, space ratio, mean token len,
    * stopword ratio (quality-scoring heuristics per SURVEY §2.2's
    * garbage-filter family, lifted to corpus scale). */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "for")

  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val len = length(t)
    val alpha = length(regexp_replace(t, "[^a-zA-Z]", ""))
    val spaces = length(regexp_replace(t, "[^ ]", ""))
    val toks = split(trim(t), "\\s+")
    val stopHits = size(filter(toks, w => lower(w).isin(Stopwords: _*)))
    df.withColumn("n_len", len)
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("alpha_ratio", round(alpha.cast("double") / greatest(len, lit(1)), 4))
      .withColumn("space_ratio", round(spaces.cast("double") / greatest(len, lit(1)), 4))
      .withColumn("stopword_ratio",
        round(stopHits.cast("double") / greatest(size(toks), lit(1)), 4))
      .withColumn("mean_token_len",
        round((len - spaces).cast("double") / greatest(size(toks), lit(1)), 4))
  }

  /** Quality filter: the keep/drop decision a pretraining pipeline makes. */
  def qualityFilter(df: DataFrame, textCol: String = "text"): DataFrame =
    withQuality(df, textCol)
      .where(col("n_tokens") >= 10 && col("alpha_ratio") >= 0.5 && col("stopword_ratio") >= 0.01)

  /** Language-ID heuristic over char classes (n-gram heuristic family):
    * deterministic, no external model. ONE code-point pass per doc via
    * the native [[graft.functions.LangIdExpr]] codegen expression —
    * semantically identical to the five-`regexp_replace` Column chain it
    * replaces (DuckDB oracle q_langid pins the equivalence; BenchAB
    * `langid_regex_vs_codegen` measures the win). This runs over every
    * document of the corpus, so the per-doc constant is the cost. */
  def langIdExpr(t: Column): Column = graft.functions.GraftColumns.langId(t)

  /** Document fingerprints: md5 (exact-dup key) + a 64-bit content hash.
    * xxhash64 is Spark-native; the md5 column is the cross-engine
    * (DuckDB-verifiable) fingerprint. */
  def withFingerprints(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("fp_md5", md5(col(textCol)))
      .withColumn("fp_xx64", xxhash64(col(textCol)))

  /** Corpus-statistics-informed quality scoring (the CCNet-family shape:
    * the corpus' OWN n-gram frequency model feeds back as a per-doc
    * filter signal — unlike the per-doc heuristics above, this op's
    * model is an aggregate of the whole dataset).
    *
    * Score = rare-trigram ratio: the fraction of a doc's character
    * trigrams (multiset — frequency weighting is the point) whose CORPUS
    * frequency is <= rareThreshold. Garbled OCR, boilerplate mangling,
    * and wrong-language fragments surface as high ratios; integer
    * arithmetic end-to-end (+ one round()) keeps it bit-reproducible in
    * DuckDB for the oracle gate.
    *
    * Scale shape: one partial-agg shuffle builds the model (bounded by
    * the distinct-trigram vocabulary, ~1M rows for natural text at ANY
    * corpus size — broadcastable), then the model is PRE-FILTERED to its
    * rare subset before the join: only rare trigrams affect `n_rare`, so
    * the build side shrinks by the common-trigram mass (on natural
    * corpora that is most occurrence volume). `n_tri` never needed the
    * join at all — a doc's trigram multiset size is `max(len - 2, 1)`,
    * computed map-side. Docs with zero rare trigrams are restored by a
    * left join against the (doc_id, n_tri) base — N small rows, not the
    * exploded occurrences. Reuses [[Dedup.shingles]] (k=3) so the trigram
    * definition is shared with the dedup family (text shorter than 3
    * chars contributes itself as its only "trigram"). */
  def rareTrigramScores(docs: DataFrame, rareThreshold: Long = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    rareScores(docs, m => m.where(col("cnt") <= rareThreshold), idCol, textCol)

  /** Scale-free thresholding (threshold = floor(corpus_docs / divisor))
    * with the count computed IN-PLAN: a one-row count aggregate is
    * cross-joined (broadcast) into the model filter, so plan build runs
    * no driver-side action — the whole thing is one job. Floor-division
    * comparison against an integer `cnt` is exactly the Long-division
    * threshold a caller would pass to [[rareTrigramScores]]. */
  def rareTrigramScoresScaleFree(docs: DataFrame, divisor: Long = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val thr = docs.agg(floor(count(lit(1)) / divisor).cast("long").as("rare_thr"))
    rareScores(docs,
      m => m.join(broadcast(thr)).where(col("cnt") <= col("rare_thr")), idCol, textCol)
  }

  private def rareScores(docs: DataFrame, rareOnly: DataFrame => DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val tris = docs.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(col(textCol), 3)).as("tri"))
    val model = tris.groupBy(col("tri")).agg(count(lit(1)).as("cnt"))
    val rareCounts = tris.join(rareOnly(model).select("tri"), "tri")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_rare"))
    // per-doc base mirrors the exploded multiset exactly: null text
    // contributes no trigrams (explode of a null array emits nothing),
    // and duplicate ids aggregate into ONE row — n_tri must cover the
    // same rows n_rare was counted over, or the ratio exceeds 1
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        when(length(col(textCol)) < 3, lit(1L))
          .otherwise((length(col(textCol)) - 2).cast("long")).as("n_tri_row"))
      .groupBy(col("doc_id")).agg(sum(col("n_tri_row")).as("n_tri"))
      .join(rareCounts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tri"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        round(coalesce(col("n_rare"), lit(0L)).cast("double") / col("n_tri"), 4)
          .as("rare_ratio"))
  }
}
