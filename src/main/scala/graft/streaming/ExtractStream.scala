package graft.streaming

import org.apache.spark.sql.Dataset
import graft.model.{InputDoc, OutSpan}
import graft.pipeline.Extract

/** Streaming extraction: documents arrive as a stream (e.g. new Iceberg
  * snapshots / Kafka of finished OCR docs) and are extracted incrementally.
  * Extraction is per-document (stateless across docs — the boilerplate
  * aggregation is within one doc), so the batch core applies unchanged:
  * readStream -> mapPartitions(extractDoc) -> append sink. Exactly-once
  * output comes from the sink's idempotence (same per-doc determinism the
  * checkpoint path relies on).
  */
object ExtractStream {

  def spans(docs: Dataset[InputDoc], runningHeadThreshold: Double = 0.5): Dataset[OutSpan] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.flatMap(d => Extract.extractDoc(d, runningHeadThreshold).spans))
  }
}
