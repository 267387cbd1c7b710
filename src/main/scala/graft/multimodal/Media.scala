package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata. The Spark side (schema, partitioning, batch shape,
  * per-partition decoder lifecycle) is real and tested; the actual codec
  * is STUBBED behind a deterministic fake header decode, clearly marked —
  * the sandbox has no image/audio libraries. In production the
  * `decodeStub` body is replaced by the real codec; every contract around
  * it (nullability, error rows, batch iteration) stays identical.
  */
object Media {

  final case class MediaRow(doc_id: String, media_ref: String, media_kind: String,
      content: Array[Byte])
  final case class MediaMeta(doc_id: String, media_ref: String, media_kind: String,
      byte_len: Int, width: Int, height: Int, n_frames: Int, ok: Boolean)

  /** Binary payload layout: a 16-byte header
    * [W:int][H:int][frames:int][magic:int] + 32 content bytes. */
  def encodeBytes(mediaRef: String, width: Int, height: Int, frames: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 32)
    bb.putInt(width).putInt(height).putInt(frames).putInt(0xfa_ce_b0_0c)
    bb.put(java.util.Arrays.copyOf(mediaRef.getBytes("UTF-8"), 32))
    bb.array()
  }

  /** Deterministic fake payload for media_ref (generator side). */
  def fakeBytes(mediaRef: String, kind: String): Array[Byte] = {
    val h = mediaRef.hashCode
    encodeBytes(mediaRef,
      width = 64 + math.abs(h % 1024),
      height = 64 + math.abs((h / 7) % 1024),
      frames = if (kind == "video") 1 + math.abs(h % 240) else 1)
  }

  /** STUB decode: parses the fake header. Replace with a real codec in
    * production (??? boundary). Runs per partition so a real decoder's
    * native context would be initialized once per task, not per row. */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaMeta] = {
    // (real impl would do: val codec = NativeCodec.acquire() here)
    rows.map { r =>
      if (r.content != null && r.content.length >= 16) {
        val bb = java.nio.ByteBuffer.wrap(r.content)
        val w = bb.getInt(); val h = bb.getInt(); val f = bb.getInt(); val magic = bb.getInt()
        MediaMeta(r.doc_id, r.media_ref, r.media_kind, r.content.length, w, h, f,
          ok = magic == 0xfa_ce_b0_0c)
      } else MediaMeta(r.doc_id, r.media_ref, r.media_kind,
        Option(r.content).map(_.length).getOrElse(0), 0, 0, 0, ok = false)
    }
  }

  /** Distributed decode/feature-extract over the media table. */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(decodeStub)
  }

  /** Frame sampling plan for videos: every `stride`th frame index —
    * mirrors the reference's ffmpeg fps=1/interval sampling
    * (src/preprocessing/frames.py:8-46) as a pure plan, decode stubbed. */
  def frameSamplePlan(meta: DataFrame, stride: Int = 30): DataFrame =
    meta.where(col("media_kind") === "video" && col("ok"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))))
      .select(col("doc_id"), col("media_ref"), col("frame_idx"))

  /** The SURVEY §2.1 "frame extraction" operator as a distributed plan:
    * the reference shells out to `ffmpeg -vf fps=1/interval` and writes
    * `frame_%04d.png` (src/preprocessing/frames.py:8-46). The DECODE is
    * the stub boundary (ffmpeg/codecs absent here — in production the
    * executor hands (media bytes, src_frame_idx) to the codec); the PLAN
    * is exact and oracle-gated (q_frame_plan): one output row per
    * sampled frame with
    *  - `frame_ord` / `frame_name`: ffmpeg's 1-based `frame_%04d.png`
    *  - `ts_sec` = ord0 * interval (the fps filter emits one frame per
    *    output period, first at t=0; n_out = ceil(duration / interval))
    *  - `src_frame_idx` = round-to-nearest source frame at that
    *    timestamp, clamped to n_frames-1 (the fps filter's default
    *    `round=near` selection; exact codec tie-breaking on duplicated/
    *    dropped timestamps is part of the stub boundary)
    *
    * Pure Column arithmetic over the media-metadata table — narrow, no
    * shuffle, codegen throughout. */
  def framePlan(meta: DataFrame, intervalSec: Double, srcFps: Double): DataFrame = {
    require(intervalSec > 0 && srcFps > 0, "intervalSec and srcFps must be positive")
    val nOut = greatest(ceil(col("n_frames") / srcFps / intervalSec), lit(1L))
    // n_frames > 0: a real decoder can report a successful decode with
    // zero frames — ffmpeg's fps filter emits nothing for those, so must
    // this plan (without the guard the greatest(...,1) floor would emit a
    // phantom frame with src_frame_idx = -1)
    meta.where(col("media_kind") === "video" && col("ok") && col("n_frames") > 0)
      .withColumn("frame_ord", explode(sequence(lit(1L), nOut)))
      .select(col("doc_id"), col("media_ref"), col("frame_ord"),
        format_string("frame_%04d.png", col("frame_ord")).as("frame_name"),
        ((col("frame_ord") - 1) * intervalSec).as("ts_sec"),
        least(col("n_frames") - 1,
          floor((col("frame_ord") - 1) * intervalSec * srcFps + 0.5)).cast("int")
          .as("src_frame_idx"))
  }

  /** Synthetic media table derived from the corpus figure spans. */
  def syntheticMedia(spark: SparkSession, docs: Dataset[graft.model.InputDoc]): Dataset[MediaRow] = {
    import spark.implicits._
    docs.flatMap { d =>
      d.spans.filter(_.media_ref.nonEmpty).map { s =>
        val kind = if (s.media_ref.hashCode % 3 == 0) "video" else "image"
        MediaRow(d.doc_id, s.media_ref, kind, fakeBytes(s.media_ref, kind))
      }
    }
  }
}
