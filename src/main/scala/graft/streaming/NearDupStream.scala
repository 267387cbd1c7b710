package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Streaming-ingest near-dup detection: documents ARRIVING as a stream
  * are checked against a STATIC historical corpus index — the shape of a
  * production training-data ingest pipeline (new crawl batches deduped
  * against the existing 100-TB corpus before admission).
  *
  * Design for Spark's streaming model:
  *  - The index side is a batch artifact: SimHash block rows of the
  *    historical corpus, persisted like any table and refreshed on the
  *    corpus' ingest cadence — incrementally via [[appendToIndex]]
  *    (O(batch + buckets) per refresh), rebuilt via [[buildIndex]] on
  *    the compaction cadence.
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
  *
  * == Persisted-index layout (versioned manifests) ==
  *
  * {{{
  *   path/
  *     segments/seg_<id>/   block-row parquet, append-only, shared across versions
  *     v_<id>/counts/       per-bucket totals — ALL buckets, over-cap included
  *     v_<id>/MANIFEST      written LAST (atomic rename): completion marker,
  *                          layout (nblocks, maxbucket), segment list, schema
  * }}}
  *
  * Swap semantics (the round-5 delete-then-rename window is gone):
  * readers resolve the HIGHEST version whose MANIFEST exists; a writer
  * creates a fresh `v_<id>` (never reuses or overwrites a directory —
  * a crashed write leaves an incomplete dir that readers skip and the
  * next committed write garbage-collects), publishes it by renaming the
  * manifest into place, and only then deletes versions older than the
  * PREVIOUS one. At every instant at least one complete version is
  * resolvable — a load can never race into a missing index — and a
  * reader that resolved the previous version keeps working through one
  * full subsequent commit. Single writer per index root assumed (the
  * usual no-catalog table-format contract).
  *
  * Why counts store over-cap buckets too: the cap must be re-applied on
  * APPEND. Bucket totals only grow, so a bucket that crosses maxBucket
  * after an append must drop its previously-written segment rows —
  * readers anti-join the (tiny, broadcast) over-cap key set; a full
  * rebuild and any append lineage reaching the same totals therefore
  * load IDENTICAL content (spec-pinned by digest equality).
  */
object NearDupStream {

  /** Batch-side index of the historical corpus: (blk, key, corpus_id,
    * corpus_sim, nblocks) block rows — the IN-MEMORY shape (stream-static
    * joins without persistence; SkewBench). The block LAYOUT (`nblocks`)
    * is carried IN the index so [[candidates]] can never join bit-slices
    * from a different layout — a silent recall-to-zero footgun otherwise.
    * For the persisted lifecycle use [[buildIndex]] / [[appendToIndex]] /
    * [[loadIndex]], which produce the same content (digest-pinned).
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

  /** A persisted corpus index handle: the (already cap-filtered) block
    * rows plus the block layout read from the O(1) manifest — no index
    * scan at streaming-query start. Obtain via [[loadIndex]]. */
  final case class CorpusIndex(df: DataFrame, nBlocks: Int) {
    def candidates(incoming: DataFrame, maxDist: Int = 3,
        idCol: String = "doc_id", textCol: String = "text"): DataFrame =
      NearDupStream.candidates(incoming, df, maxDist, idCol, textCol,
        nBlocksKnown = Some(nBlocks))
  }

  /** One committed index version: the state of the whole index after
    * this commit (suppression figures are INDEX-WIDE totals from the
    * committed counts, not per-batch deltas — the number a production
    * recall monitor wants to alert on). */
  final case class IndexStats(version: Long, segment: String,
      suppressedBuckets: Long, suppressedRows: Long)

  private final case class Manifest(nBlocks: Int, maxBucket: Int,
      segments: Seq[String], segSchema: StructType)

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listIds(fs: FileSystem, dir: Path, prefix: String): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.drop(prefix.length).toLong).toOption)

  private def vDir(root: Path, v: Long): Path = new Path(root, f"v_$v%08d")
  private def segName(id: Long): String = f"seg_$id%08d"

  /** Highest version id whose MANIFEST exists (= completed commit). */
  private def currentVersion(fs: FileSystem, root: Path): Option[Long] =
    listIds(fs, root, "v_").sorted(Ordering[Long].reverse)
      .find(v => fs.exists(new Path(vDir(root, v), "MANIFEST")))

  private def readManifest(fs: FileSystem, root: Path, v: Long): Manifest = {
    val in = fs.open(new Path(vDir(root, v), "MANIFEST"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    def one(k: String): String = lines.collectFirst {
      case l if l.startsWith(s"$k=") => l.drop(k.length + 1)
    }.getOrElse(throw new IllegalStateException(s"MANIFEST v$v missing '$k'"))
    Manifest(one("nblocks").toInt, one("maxbucket").toInt,
      lines.filter(_.startsWith("segment=")).map(_.drop("segment=".length)),
      DataType.fromJson(one("segschema")).asInstanceOf[StructType])
  }

  /** Publish a version: manifest written to a temp name then renamed into
    * place — the rename IS the commit point, so a reader either sees a
    * complete version or none of it. */
  private def writeManifest(fs: FileSystem, root: Path, v: Long, m: Manifest): Unit = {
    val dir = vDir(root, v)
    val tmp = new Path(dir, ".manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write((s"nblocks=${m.nBlocks}\nmaxbucket=${m.maxBucket}\n" +
      s"segschema=${m.segSchema.json}\n" +
      m.segments.map(s => s"segment=$s\n").mkString).getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, new Path(dir, "MANIFEST")),
      s"manifest publish failed for $dir")
  }

  /** Delete versions older than the previous complete one (readers that
    * resolved `previous` keep working through this commit) plus any dead
    * incomplete dirs below `current`, and segments referenced by neither
    * surviving manifest. */
  private def cleanup(fs: FileSystem, root: Path, current: Long): Unit = {
    val complete = listIds(fs, root, "v_").sorted
      .filter(v => fs.exists(new Path(vDir(root, v), "MANIFEST")))
    val keep = complete.filter(_ <= current).takeRight(2).toSet + current
    listIds(fs, root, "v_").filter(v => v < current && !keep.contains(v))
      .foreach(v => fs.delete(vDir(root, v), true))
    val referenced = keep.toSeq.filter(v => fs.exists(new Path(vDir(root, v), "MANIFEST")))
      .flatMap(v => readManifest(fs, root, v).segments).toSet
    val segRoot = new Path(root, "segments")
    listIds(fs, segRoot, "seg_").map(segName)
      .filterNot(referenced)
      .foreach(s => fs.delete(new Path(segRoot, s), true))
  }

  private val CountsSchema = StructType.fromDDL("blk INT, key BIGINT, n BIGINT")

  private def readCounts(spark: SparkSession, root: Path, v: Long): DataFrame =
    spark.read.schema(CountsSchema).parquet(new Path(vDir(root, v), "counts").toString)

  /** Block rows of `docs` in the index's column shape. */
  private def blockRows(docs: DataFrame, nBlocks: Int,
      idCol: String, textCol: String): DataFrame =
    graft.ops.Dedup.simhashBlocks(docs, nBlocks, idCol, textCol)
      .select(col("blk"), col("key"),
        col("doc_id").as("corpus_id"), col("simhash").as("corpus_sim"))

  /** Shared commit body: write full-bucket counts, then the new segment
    * with over-cap buckets' rows dropped MAP-SIDE (broadcast anti-join —
    * the hot mass is never shuffled OR stored), publish the manifest,
    * garbage-collect. Any failure before the manifest rename leaves the
    * previous version fully intact (the fresh dirs are deleted best-
    * effort and are skipped by readers regardless). */
  private def commit(spark: SparkSession, root: Path, fs: FileSystem,
      newBlocks: DataFrame, mergedCounts: DataFrame, nBlocks: Int, maxBucket: Int,
      priorSegments: Seq[String]): IndexStats = {
    val newV = listIds(fs, root, "v_").foldLeft(0L)(math.max) + 1
    val seg = segName(listIds(fs, new Path(root, "segments"), "seg_").foldLeft(-1L)(math.max) + 1)
    val dir = vDir(root, newV)
    val segPath = new Path(root, s"segments/$seg")
    val stats = try {
      mergedCounts.select(col("blk").cast("int"), col("key").cast("long"),
          col("n").cast("long"))
        .write.parquet(new Path(dir, "counts").toString)
      val counts = readCounts(spark, root, newV)
      val over = counts.where(col("n") > maxBucket)
      val st = over.agg(coalesce(count(lit(1)), lit(0L)).as("b"),
        coalesce(sum(col("n")), lit(0L)).as("r")).head()
      val segDf = newBlocks
        .join(broadcast(over.select(col("blk"), col("key"))), Seq("blk", "key"), "left_anti")
        .withColumn("nblocks", lit(nBlocks))
      segDf.write.parquet(segPath.toString)
      writeManifest(fs, root, newV, Manifest(nBlocks, maxBucket,
        priorSegments :+ seg, segDf.schema))
      IndexStats(newV, seg, st.getLong(0), st.getLong(1))
    } catch {
      case e: Throwable =>
        // pre-commit failure: the fresh dirs are invisible to readers
        // (no manifest) — remove them, previous version stays live
        fs.delete(dir, true); fs.delete(segPath, true)
        throw e
    }
    // post-commit GC is best-effort and must never roll back the commit
    cleanup(fs, root, newV)
    stats
  }

  /** Build (or rebuild) a persisted index from the full corpus. Two
    * passes over the corpus blocks, NO corpus-scale shuffle: pass 1 is
    * the per-bucket count aggregate (map-side combine collapses each
    * bucket to one row per map partition — the shuffle moves bucket
    * summaries, not rows; a 10^9-copy hot key costs ~one row per
    * partition here, where the in-memory [[corpusIndex]] window shape
    * shuffles and spills its full mass); pass 2 writes the segment with
    * over-cap buckets dropped map-side against the broadcast over-cap
    * key set. Loaded content is identical to
    * `corpusIndex(corpus, nBlocks, maxBucket)` (spec-pinned).
    *
    * A rebuild on an existing `path` starts a fresh segment lineage; the
    * superseded segments are garbage-collected once out of the reader
    * grace window. */
  def buildIndex(corpus: DataFrame, path: String, nBlocks: Int = 4,
      maxBucket: Int = 1000, idCol: String = "doc_id",
      textCol: String = "text"): IndexStats = {
    val spark = corpus.sparkSession
    val root = new Path(path)
    val fs = fsOf(spark, path)
    val blocks = blockRows(corpus, nBlocks, idCol, textCol)
    val counts = blocks.groupBy(col("blk"), col("key")).agg(count(lit(1)).as("n"))
    commit(spark, root, fs, blocks, counts, nBlocks, maxBucket, Seq.empty)
  }

  /** Incrementally admit an ingest batch into a persisted index:
    * O(batch + buckets), NEVER O(corpus) — the existing segments are not
    * read (spec-asserted via stage input metrics). Block derivation and
    * the per-batch counts touch only the batch; the merge touches only
    * the per-bucket count table (the index's bucket summary, orders of
    * magnitude smaller than the corpus). The cap is re-applied on the
    * MERGED totals, so a bucket that crosses maxBucket with this batch
    * drops out of the loaded view — including its rows in EARLIER
    * segments (readers anti-join the over-cap keys) — keeping
    * append-lineage content identical to a full rebuild (digest-pinned).
    * Layout (nblocks/maxbucket) comes from the live manifest: an append
    * can never mix block layouts. */
  def appendToIndex(batch: DataFrame, path: String, idCol: String = "doc_id",
      textCol: String = "text"): IndexStats = {
    val spark = batch.sparkSession
    val root = new Path(path)
    val fs = fsOf(spark, path)
    val cur = currentVersion(fs, root).getOrElse(throw new IllegalStateException(
      s"appendToIndex: no committed index at $path — buildIndex first"))
    val m = readManifest(fs, root, cur)
    val blocks = blockRows(batch, m.nBlocks, idCol, textCol)
    // a batch whose id column differs in type from the committed
    // segments would write a segment the manifest schema can't describe
    // — fail loudly at append time, not at some later load
    val newSchema = blocks.withColumn("nblocks", lit(m.nBlocks)).schema
    require(newSchema.map(f => (f.name, f.dataType)) ==
        m.segSchema.map(f => (f.name, f.dataType)),
      s"appendToIndex: batch block schema ${newSchema.simpleString} != " +
        s"index segment schema ${m.segSchema.simpleString}")
    val batchCounts = blocks.groupBy(col("blk"), col("key")).agg(count(lit(1)).as("bn"))
    val merged = readCounts(spark, root, cur).as("o")
      .join(batchCounts.as("b"), Seq("blk", "key"), "full_outer")
      .select(col("blk"), col("key"),
        (coalesce(col("o.n"), lit(0L)) + coalesce(col("b.bn"), lit(0L))).as("n"))
    commit(spark, root, fs, blocks, merged, m.nBlocks, m.maxBucket, m.segments)
  }

  /** Load a persisted index: resolve the current manifest (O(1) — one
    * directory listing + one small file, independent of index size),
    * union the listed segments, and drop over-cap buckets' rows via a
    * broadcast anti-join against the (tiny) over-cap key set from the
    * counts table. Explicit schemas from the manifest keep empty
    * segments/corpora loadable (no parquet schema inference). */
  def loadIndex(spark: SparkSession, path: String): CorpusIndex = {
    val root = new Path(path)
    val fs = fsOf(spark, path)
    val cur = currentVersion(fs, root).getOrElse(throw new IllegalStateException(
      s"no committed index at $path"))
    val m = readManifest(fs, root, cur)
    val segs = spark.read.schema(m.segSchema)
      .parquet(m.segments.map(s => s"$path/segments/$s"): _*)
    val over = readCounts(spark, root, cur)
      .where(col("n") > m.maxBucket).select(col("blk"), col("key"))
    CorpusIndex(segs.join(broadcast(over), Seq("blk", "key"), "left_anti"), m.nBlocks)
  }

  /** Near-dup candidates of `incoming` (batch OR streaming DataFrame)
    * against a corpus index: block-key equi-join + exact popcount.
    * The block layout comes FROM the index — via `nBlocksKnown` when the
    * index was loaded through the [[loadIndex]] manifest (O(1), the
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
