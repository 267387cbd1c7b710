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

  /** Batch-side index of the historical corpus: (blk, key, doc_id,
    * simhash) block rows, renamed for the stream-static join. */
  def corpusIndex(corpus: DataFrame, nBlocks: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    graft.ops.Dedup.simhashBlocks(corpus, nBlocks, idCol, textCol)
      .select(col("blk"), col("key"),
        col("doc_id").as("corpus_id"), col("simhash").as("corpus_sim"))

  /** Near-dup candidates of `incoming` (batch OR streaming DataFrame)
    * against a [[corpusIndex]]: block-key equi-join + exact popcount.
    * Emits (doc_id, corpus_id, hamming) — once per SHARED BLOCK; apply
    * dropDuplicates in the per-batch sink (see scaladoc above). */
  def candidates(incoming: DataFrame, index: DataFrame, maxDist: Int = 3,
      nBlocks: Int = 4, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    graft.ops.Dedup.simhashBlocks(incoming, nBlocks, idCol, textCol)
      .join(index, Seq("blk", "key"))
      .withColumn("hamming", bit_count(col("simhash").bitwiseXOR(col("corpus_sim"))))
      .where(col("hamming") <= maxDist)
      .select(col("doc_id"), col("corpus_id"), col("hamming"))
}
