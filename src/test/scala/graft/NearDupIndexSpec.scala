package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.NearDupStream

/** The persisted near-dup index lifecycle: incremental appendToIndex
  * must be indistinguishable from a full rebuild in loaded content and
  * candidates (including buckets that cross the cap only ACROSS
  * appends), must cost O(batch + buckets) rather than O(corpus)
  * (asserted via stage input metrics — the committed segments are never
  * read), and the versioned-manifest swap must always leave a complete
  * version resolvable (crashed/incomplete commits are skipped; the
  * previous version survives one full subsequent commit). */
class NearDupIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("graft-ndindex")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Deterministic corpus with a hot family (shared simhash bucket mass)
    * sized so the family is UNDER the cap in part 1 alone and OVER it
    * once part 2 lands — the append must retroactively evict the
    * family's part-1 segment rows. */
  private def corpus(n: Int, hotEvery: Int): DataFrame = {
    val ss = spark; import ss.implicits._
    (0 until n).map { i =>
      val text =
        if (i % hotEvery == 0) "boilerplate header repeated on every page of the site"
        else s"unique document $i body with its own words ${i * 37} and ${i * 91}"
      (f"d$i%05d", text)
    }.toDF("doc_id", "text")
  }

  private def contentKey(ci: NearDupStream.CorpusIndex): Seq[String] =
    ci.df.collect().map(_.toString).sorted.toSeq

  test("append-then-load == full rebuild: content digest-equal, candidates identical") {
    val ss = spark; import ss.implicits._
    val docs = corpus(400, 20) // 20 hot docs total
    val part1 = docs.where($"doc_id" < "d00300") // 15 hot — under cap 16
    val part2 = docs.where($"doc_id" >= "d00300") // +5 hot -> 20 — over cap
    val base = java.nio.file.Files.createTempDirectory("ndappend").toString

    NearDupStream.buildIndex(docs, s"$base/rebuild", maxBucket = 16)
    NearDupStream.buildIndex(part1, s"$base/inc", maxBucket = 16)
    val st = NearDupStream.appendToIndex(part2, s"$base/inc")
    assert(st.version == 2L)
    // index-wide suppression after the append sees the crossed bucket(s)
    assert(st.suppressedBuckets >= 1 && st.suppressedRows >= 20)

    val reb = NearDupStream.loadIndex(spark, s"$base/rebuild")
    val inc = NearDupStream.loadIndex(spark, s"$base/inc")
    assert(inc.nBlocks == reb.nBlocks)
    val rebRows = contentKey(reb)
    assert(contentKey(inc) == rebRows, "append lineage diverged from rebuild")
    // the cap-crossing actually happened: the hot family is ABSENT from
    // both (present in a part1-only index)
    val part1Only = NearDupStream.loadIndex(spark, {
      val p = s"$base/p1only"
      NearDupStream.buildIndex(part1, p, maxBucket = 16); p
    })
    assert(contentKey(part1Only).exists(_.contains("d00000")) &&
      !rebRows.exists(_.contains("d00000")))

    val probe = Seq(
      ("q0", "boilerplate header repeated on every page of the site"),
      ("q1", "unique document 42 body with its own words 1554 and 3822"),
      ("q2", "totally novel probe text that matches nothing at all here"))
      .toDF("doc_id", "text")
    val viaInc = inc.candidates(probe, maxDist = 16)
      .as[(String, String, Int)].collect().toSet
    val viaReb = reb.candidates(probe, maxDist = 16)
      .as[(String, String, Int)].collect().toSet
    assert(viaInc == viaReb)
    assert(viaInc.exists(_._1 == "q1") && !viaInc.exists(_._1 == "q2"))
    // the hot family is suppressed -> its probe finds nothing (recall
    // loss is the DOCUMENTED cap contract, and it must be consistent)
    assert(!viaInc.exists(_._1 == "q0"))

    // Digest-level equality through the engine's own canonical digest
    val (rn, rsha) = Digest.corpusSha(reb.df, "ndindex")
    val (in_, isha) = Digest.corpusSha(inc.df, "ndindex")
    assert(rn == in_ && rsha == isha)
  }

  test("append touches O(batch + buckets), never the committed segments") {
    val ss = spark; import ss.implicits._
    // big base index, tiny batch
    val big = corpus(20000, 100000) // effectively all-unique
    val batch = corpus(50, 100000)
      .withColumn("doc_id", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("b_"), $"doc_id"))
    val base = java.nio.file.Files.createTempDirectory("ndobatch").toString
    NearDupStream.buildIndex(big, s"$base/idx")

    val segBytes = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(s"$base/idx/segments"))
    }
    assert(segBytes > 200000, s"segment corpus unexpectedly small: $segBytes")

    var bytesRead = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        bytesRead += te.taskMetrics.inputMetrics.bytesRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      NearDupStream.appendToIndex(batch, s"$base/idx")
      // listener delivery is async: wait for the byte counter to settle
      var last = -1L
      var spins = 0
      while (bytesRead != last && spins < 50) {
        last = bytesRead; Thread.sleep(100); spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // the append reads the batch (in-memory) + the counts table; reading
    // the committed segments would show up as >= segBytes of input
    assert(bytesRead < segBytes / 2,
      s"append read $bytesRead bytes vs $segBytes of segments — O(corpus) scan?")
    // and the result is still exactly the rebuild of the union
    val reb = {
      val p = s"$base/reb"
      NearDupStream.buildIndex(big.unionByName(batch), p); p
    }
    assert(contentKey(NearDupStream.loadIndex(spark, reb)) ==
      contentKey(NearDupStream.loadIndex(spark, s"$base/idx")))
  }

  test("gapless swap: incomplete commits skipped, previous version survives one commit") {
    val ss = spark; import ss.implicits._
    val base = java.nio.file.Files.createTempDirectory("ndswap").toString
    val p = s"$base/idx"
    NearDupStream.buildIndex(corpus(40, 1000), p)
    // a reader that resolved v1 BEFORE the next commit...
    val v1Handle = NearDupStream.loadIndex(spark, p)
    val v1Rows = contentKey(v1Handle)
    // ...survives a full append commit (keep-two GC policy)
    NearDupStream.appendToIndex(corpus(10, 1000)
      .withColumn("doc_id", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("a_"), $"doc_id")), p)
    assert(new java.io.File(s"$p/v_00000001/MANIFEST").isFile &&
      new java.io.File(s"$p/v_00000002/MANIFEST").isFile)
    assert(contentKey(v1Handle) == v1Rows, "pre-swap reader broke mid-commit")
    // a crashed writer's incomplete dir (no MANIFEST) is invisible to
    // readers and does not block the next commit from taking the next id
    new java.io.File(s"$p/v_00000007").mkdirs()
    assert(NearDupStream.loadIndex(spark, p).nBlocks == 4) // resolves v2
    val st = NearDupStream.appendToIndex(corpus(5, 1000)
      .withColumn("doc_id", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("c_"), $"doc_id")), p)
    assert(st.version == 8L) // never reuses a dirty dir
    // GC: v1 (older than previous) and the dead v7 are gone; v2+v8 live
    assert(!new java.io.File(s"$p/v_00000001").exists)
    assert(!new java.io.File(s"$p/v_00000007").exists)
    assert(new java.io.File(s"$p/v_00000002/MANIFEST").isFile &&
      new java.io.File(s"$p/v_00000008/MANIFEST").isFile)
    // appending to a path with no committed version is a clear error
    val e = intercept[IllegalStateException] {
      NearDupStream.appendToIndex(corpus(5, 1000), s"$base/nothere")
    }
    assert(e.getMessage.contains("buildIndex first"))
    // an append whose id TYPE diverges from the committed segments fails
    // loudly at append time, not at some later load
    val badBatch = spark.range(3).selectExpr("id AS doc_id", "'text body' AS text")
    val te = intercept[IllegalArgumentException] {
      NearDupStream.appendToIndex(badBatch, p)
    }
    assert(te.getMessage.contains("segment schema"))
  }
}
