package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming-ingest near-dup detection: documents ARRIVING as a stream
  * are checked against a STATIC historical corpus index — the shape of a
  * production training-data ingest pipeline (new crawl batches deduped
  * against the existing 100-TB corpus before admission).
  *
  * Design for Spark's streaming model:
  *  - The index side ([[corpusIndex]]) is a batch artifact: SimHash block
  *    rows of the historical corpus, persisted like any table and
  *    refreshed on the corpus' own compaction cadence.
  *  - The stream side is STATELESS: [[graft.ops.Dedup.simhashBlocks]] is
  *    pure codegen expressions (in-row simhash64 + bit-slice keys), so
  *    each micro-batch maps and joins with no streaming aggregation, no
  *    watermark, no state store. Structured Streaming executes the
  *    stream-static equi-join per micro-batch; at scale the static side
  *    is a bucketed table and AQE/broadcast handles the join shape.
  *  - A pair that shares several blocks appears once per shared block in
  *    the raw join; the exact popcount verify makes every emitted row
  *    correct, and the per-batch sink (foreachBatch in production, as in
  *    the spec) applies `dropDuplicates` WITHIN the batch — bounded work,
  *    no cross-batch state. Cross-batch re-arrivals of the same doc are
  *    re-checked by design (ingest retries must re-admit deterministically).
  *
  * Recall contract == [[graft.ops.Dedup.simhashPairs]]: exact for
  * maxDist <= nBlocks - 1 (pigeonhole), partial-recall candidate
  * generation beyond.
  */
object NearDupStream {

  /** Batch-side index of the historical corpus: (blk, key, corpus_id,
    * corpus_sim, nblocks) block rows. The block LAYOUT (`nblocks`) is
    * carried IN the index so [[candidates]] can never join bit-slices
    * from a different layout — a silent recall-to-zero footgun otherwise.
    *
    * Degenerate block buckets are capped exactly like the batch op
    * ([[graft.ops.Dedup.simhashPairs]] maxBucket, same default and
    * rationale): a boilerplate-heavy corpus concentrates mass in few
    * (blk, key) groups (all-empty docs hash to simhash 0L), and an
    * uncapped hot key joined against every micro-batch would emit
    * |bucket| x |batch-hits| rows per batch. Capping the STATIC side
    * bounds the join product; the drop is observable via `suppressed`
    * (same contract as the batch ops). */
  def corpusIndex(corpus: DataFrame, nBlocks: Int = 4, maxBucket: Int = 1000,
      idCol: String = "doc_id", textCol: String = "text",
      suppressed: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val blocks = graft.ops.Dedup.simhashBlocks(corpus, nBlocks, idCol, textCol)
      .select(col("blk"), col("key"),
        col("doc_id").as("corpus_id"), col("simhash").as("corpus_sim"))
    // size-before-keep via a window on ONE shuffle (same rationale as
    // [[graft.ops.Dedup.cappedBuckets]]: the count-agg + join-back shape
    // can't ReuseExchange, so the full-corpus block derivation would run
    // twice per index build); suppression metrics ride the windowed rows
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("blk"), col("key"))
    val counted = blocks.withColumn("bucket_n", count(lit(1)).over(w))
    val countedObs = suppressed.fold(counted)(
      graft.ops.Dedup.observeSuppressedWindow(counted, "bucket_n", maxBucket, _))
    countedObs.where(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
      .withColumn("nblocks", lit(nBlocks))
  }

  /** A persisted corpus index handle: the block rows plus the block
    * layout read from the O(1) `_index_meta` sidecar — no index scan at
    * streaming-query start. Obtain via [[loadIndex]]. */
  final case class CorpusIndex(df: DataFrame, nBlocks: Int) {
    def candidates(incoming: DataFrame, maxDist: Int = 3,
        idCol: String = "doc_id", textCol: String = "text"): DataFrame =
      NearDupStream.candidates(incoming, df, maxDist, idCol, textCol,
        nBlocksKnown = Some(nBlocks))
  }

  /** Persist a [[corpusIndex]] with its layout as METADATA: the index
    * parquet plus a one-row `_index_meta` sidecar (underscore-prefixed,
    * so table readers ignore it) carrying `nblocks`. Layout consistency
    * is validated ON the write job via observe() — a mixed-layout index
    * (concatenated indexes built with different nBlocks) fails HERE, at
    * build time, instead of poisoning every later stream join. With the
    * sidecar, [[loadIndex]]/[[CorpusIndex.candidates]] never scan the
    * index to discover its layout — the probe is one tiny file read
    * regardless of index size. */
  def writeIndex(index: DataFrame, path: String): Unit = {
    val spark = index.sparkSession
    // write to a sibling temp dir first: validation failure (or a crash
    // mid-write) must leave any EXISTING index at `path` untouched — an
    // Overwrite of the live path would destroy the good index BEFORE the
    // layout check could reject the bad one
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".__writing__")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val obs = new org.apache.spark.sql.Observation()
    index.observe(obs, min(col("nblocks")).as("mn"), max(col("nblocks")).as("mx"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp.toString)
    try {
      // empty map = AQE dropped the metrics node on a fully-empty result
      // (the documented AQEPropagateEmptyRelation caveat) — same meaning
      // as null min/max: nothing written, nothing to validate
      val m = obs.get
      val (mn, mx) = (m.get("mn").flatMap(Option(_)).map(_.asInstanceOf[Int]),
        m.get("mx").flatMap(Option(_)).map(_.asInstanceOf[Int]))
      require(mn == mx, s"index mixes block layouts: ${mn.get}..${mx.get} — " +
        "rebuild with one corpusIndex nBlocks")
      // empty corpus -> empty index: any layout joins to zero candidates;
      // record the default so loadIndex stays total
      val nBlocks = mn.getOrElse(4)
      import spark.implicits._
      Seq(nBlocks).toDF("nblocks").repartition(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(new org.apache.hadoop.fs.Path(tmp, "_index_meta").toString)
    } catch {
      case e: Throwable => fs.delete(tmp, true); throw e
    }
    // swap: the validated index (sidecar included) replaces the old one.
    // The delete->rename window is the non-transactional-FS residual; a
    // crash inside it leaves the complete new index at `path.__writing__`
    // for manual recovery, never a half-written live path.
    if (fs.exists(target)) fs.delete(target, true)
    require(fs.rename(tmp, target), s"rename $tmp -> $target failed")
  }

  /** Load a [[writeIndex]]-persisted index: the layout comes from the
    * one-row sidecar (O(1) — independent of index size). */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): CorpusIndex = {
    val meta = spark.read.parquet(s"$path/_index_meta")
      .select(col("nblocks").cast("int"))
      .as[Int](org.apache.spark.sql.Encoders.scalaInt).collect()
    require(meta.length == 1, s"malformed _index_meta at $path (${meta.length} rows)")
    CorpusIndex(spark.read.parquet(path), meta.head)
  }

  /** Near-dup candidates of `incoming` (batch OR streaming DataFrame)
    * against a [[corpusIndex]]: block-key equi-join + exact popcount.
    * The block layout comes FROM the index — via `nBlocksKnown` when the
    * index was loaded through the [[loadIndex]] sidecar (O(1), the
    * production path), else discovered by a one-column distinct over the
    * index at plan-build time (fine for an in-memory index; a full
    * column scan against a persisted corpus-scale one — use
    * [[loadIndex]] there). Either way incoming docs are always sliced
    * with the layout the index was built with. Emits
    * (doc_id, corpus_id, hamming) — once per SHARED BLOCK; apply
    * dropDuplicates in the per-batch sink (see scaladoc above). */
  def candidates(incoming: DataFrame, index: DataFrame, maxDist: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      nBlocksKnown: Option[Int] = None): DataFrame = {
    require(index.columns.contains("nblocks"),
      "index must come from NearDupStream.corpusIndex (missing nblocks column)")
    val nBlocks = nBlocksKnown.getOrElse {
      val layouts = index.select("nblocks").distinct().as[Int](
        org.apache.spark.sql.Encoders.scalaInt).collect()
      require(layouts.length <= 1, s"index mixes block layouts: ${layouts.mkString(",")}")
      if (layouts.isEmpty) 4 else layouts.head
    }
    graft.ops.Dedup.simhashBlocks(incoming, nBlocks, idCol, textCol)
      .join(index.drop("nblocks"), Seq("blk", "key"))
      .withColumn("hamming", bit_count(col("simhash").bitwiseXOR(col("corpus_sim"))))
      .where(col("hamming") <= maxDist)
      .select(col("doc_id"), col("corpus_id"), col("hamming"))
  }
}
