package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analog of the reference's stateful sequential
  * passes (SURVEY §2.9). The reference is batch-only; this demonstrates
  * the same dedup-vs-last-KEPT semantics (src/preprocessing/
  * deduplicate.py:45-62) as an incremental pipeline: frames arrive as a
  * stream keyed by doc_id, state = (last kept phash, next page number),
  * emitted rows are the kept frames with their renumbered page ids.
  *
  * Frames must arrive in frame_idx order per doc (the generator/source
  * guarantees it, as the reference's sorted glob does); for out-of-order
  * sources an event-time watermark + in-state buffer would replace the
  * direct fold — noted, not required by the reference semantics.
  */
object DedupStream {

  final case class Frame(doc_id: String, frame_idx: Int, phash: Long)
  final case class KeptFrame(doc_id: String, frame_idx: Int, page_num: Int, phash: Long)
  final case class DedupState(lastKept: Long, hasLast: Boolean, nextPage: Int)

  def dedupeFrames(
      frames: Iterator[Frame],
      state: GroupState[DedupState],
      hashThreshold: Int
  ): Iterator[KeptFrame] = {
    var st = state.getOption.getOrElse(DedupState(0L, hasLast = false, nextPage = 1))
    val out = Vector.newBuilder[KeptFrame]
    frames.toVector.sortBy(_.frame_idx).foreach { f =>
      val dup = st.hasLast && java.lang.Long.bitCount(st.lastKept ^ f.phash) < hashThreshold
      if (!dup) {
        out += KeptFrame(f.doc_id, f.frame_idx, st.nextPage, f.phash)
        st = DedupState(f.phash, hasLast = true, st.nextPage + 1)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** readStream -> flatMapGroupsWithState -> kept frames. */
  def run(frames: Dataset[Frame], hashThreshold: Int = 8): Dataset[KeptFrame] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[DedupState, KeptFrame](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: String, it: Iterator[Frame], st: GroupState[DedupState]) =>
          dedupeFrames(it, st, hashThreshold))
  }
}
