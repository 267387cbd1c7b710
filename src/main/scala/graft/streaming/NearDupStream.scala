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
    val counts = blocks.groupBy(col("blk"), col("key"))
      .agg(count(lit(1)).as("bucket_n"))
    val countsObs = suppressed.fold(counts)(o => counts.observe(o,
      coalesce(sum(when(col("bucket_n") > maxBucket, 1L).otherwise(0L)), lit(0L))
        .as("suppressed_buckets"),
      coalesce(sum(when(col("bucket_n") > maxBucket, col("bucket_n")).otherwise(0L)),
        lit(0L)).as("suppressed_rows")))
    blocks.join(countsObs.where(col("bucket_n") <= maxBucket), Seq("blk", "key"))
      .drop("bucket_n")
      .withColumn("nblocks", lit(nBlocks))
  }

  /** Near-dup candidates of `incoming` (batch OR streaming DataFrame)
    * against a [[corpusIndex]]: block-key equi-join + exact popcount.
    * The block layout comes FROM the index (its `nblocks` column — one
    * tiny static-side action at plan-build time), so incoming docs are
    * always sliced with the layout the index was built with. Emits
    * (doc_id, corpus_id, hamming) — once per SHARED BLOCK; apply
    * dropDuplicates in the per-batch sink (see scaladoc above). */
  def candidates(incoming: DataFrame, index: DataFrame, maxDist: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(index.columns.contains("nblocks"),
      "index must come from NearDupStream.corpusIndex (missing nblocks column)")
    val layouts = index.select("nblocks").distinct().as[Int](
      org.apache.spark.sql.Encoders.scalaInt).collect()
    require(layouts.length <= 1, s"index mixes block layouts: ${layouts.mkString(",")}")
    val nBlocks = if (layouts.isEmpty) 4 else layouts.head
    graft.ops.Dedup.simhashBlocks(incoming, nBlocks, idCol, textCol)
      .join(index.drop("nblocks"), Seq("blk", "key"))
      .withColumn("hamming", bit_count(col("simhash").bitwiseXOR(col("corpus_sim"))))
      .where(col("hamming") <= maxDist)
      .select(col("doc_id"), col("corpus_id"), col("hamming"))
  }
}
